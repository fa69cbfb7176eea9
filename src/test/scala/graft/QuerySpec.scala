package graft

import java.sql.Timestamp
import graft.corpus.Corpus
import graft.oracle.NaiveIndex
import graft.query.{IndexReader, QuerySet}
import graft.sources.TableIO
import graft.sync.SyncJob

/** The rank-identity gate (BASELINE.json): every reference query's top-k
  * (docId, score) from block-max WAND must equal the naive oracle's,
  * scores bit-for-bit. TAAT (no pruning) cross-checks WAND's skipping.
  */
class QuerySpec extends SparkTestBase {

  val N = 1000
  val K = 10

  lazy val oracle = new NaiveIndex(Corpus.localRows(N))
  lazy val reader: IndexReader = {
    val root = tmpDir("graft-index")
    val io = new TableIO(spark, root)
    val pages = Corpus.pages(spark, N, 4)
    SyncJob.run(spark, io, pages,
      new Timestamp(Corpus.warcTsMillis(N.toLong)))
    new IndexReader(spark, root)
  }

  test("index stats match oracle") {
    assert(reader.stats.n == oracle.n)
    assert(reader.stats.avgdl == oracle.avgdl)
  }

  QuerySet.all.foreach { case (name, q) =>
    test(s"$name [$q]: WAND top-$K rank- and score-identical to oracle") {
      val expected = oracle.topK(q, K)
      val got = reader.topK(q, K, useWand = true)
      assert(got.length == expected.length,
        s"hit count: got ${got.length}, want ${expected.length}")
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.docId == e.docId,
          s"rank ${i + 1} docId: got ${g.docId}, want ${e.docId}")
        assert(g.score == e.score,
          s"rank ${i + 1} score: got ${g.score}, want ${e.score} (bitwise)")
      }
    }
  }

  test("TAAT (exhaustive) agrees with WAND on every query") {
    QuerySet.all.foreach { case (name, q) =>
      val wand = reader.topK(q, K, useWand = true).toSeq
      val taat = reader.topK(q, K, useWand = false).toSeq
      assert(wand == taat, s"WAND/TAAT divergence on $name")
    }
  }

  test("search() returns ranked docs with urls") {
    val res = reader.search("rare07", 5)
    assert(res.nonEmpty)
    assert(res.map(_.rank).toSeq == (1 to res.length))
    res.foreach(r => assert(r.url == oracle.urlOf(r.docId)))
  }

  test("zero-hit query returns empty") {
    assert(reader.topK("zzzznotaword", K).isEmpty)
    assert(reader.search("", K).isEmpty)
  }

  test("k larger than corpus") {
    val got = reader.topK("rare07", 100000)
    val expected = oracle.topK("rare07", 100000)
    assert(got.map(h => (h.docId, h.score)).toSeq ==
      expected.map(h => (h.docId, h.score)).toSeq)
  }
}
