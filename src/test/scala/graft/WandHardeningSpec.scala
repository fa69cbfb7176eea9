package graft

import org.scalacheck.Gen
import graft.PropHelper.forAllSeeded
import graft.corpus.Corpus
import graft.index.{DocIds, SegmentBuilder}
import graft.oracle.NaiveIndex
import graft.query.{Bm25, Wand}

/** WAND pruning hardening: randomized queries and adversarially small
  * blocks, evaluated locally (no Spark) against both TAAT and the naive
  * oracle. A rank-safety bug in the block-max skip logic would show up
  * here long before the fixed 20-query set catches it.
  */
class WandHardeningSpec extends org.scalatest.funsuite.AnyFunSuite {

  val N = 400
  lazy val oracle = new NaiveIndex(Corpus.localRows(N))

  /** Local block build with a given block size (exercises multi-block
    * runs + block-max skipping at size 4).
    */
  private def buildBlocks(blockSize: Int): Map[(String, Int), Array[IndexBlock]] = {
    val postings = oracle.docs.flatMap { d =>
      d.tfs.map { case (t, tf) =>
        Posting(t, DocIds.bucket(d.docId), d.docId, tf, d.dl)
      }
    }
    postings.groupBy(p => (p.term, p.bucket)).map { case (key, ps) =>
      val sorted = ps.sortBy(_.docId).toArray
      val blocks = sorted.grouped(blockSize).zipWithIndex.map {
        case (chunk, bi) =>
          val ids = chunk.map(_.docId)
          IndexBlock(key._1, key._2, bi, ids.head, ids.last, chunk.length,
            chunk.map(_.tf).max, chunk.map(_.dl).min,
            chunk.map(_.tf.toLong).sum,
            graft.index.Codec.encodeDocIds(ids, ids.head),
            graft.index.Codec.encodeInts(chunk.map(_.tf)),
            graft.index.Codec.encodeInts(chunk.map(_.dl)), "b")
      }.toArray
      key -> blocks
    }
  }

  private def engineTopK(blocks: Map[(String, Int), Array[IndexBlock]],
                         q: String, k: Int, wand: Boolean): Seq[Hit] = {
    val terms = Bm25.queryTerms(q).filter(t => oracle.postings.contains(t))
    if (terms.isEmpty) return Seq.empty
    val idf = terms.map(t => t -> Bm25.idf(oracle.n, oracle.df(t))).toMap
    val byBucket = blocks.filter(e => terms.contains(e._1._1))
      .groupBy(_._1._2)
    byBucket.values.toSeq
      .flatMap { g =>
        val byTerm = g.map { case ((t, _), bs) => (t, bs) }.toSeq
        if (wand) Wand.topKInBucket(byTerm, idf, oracle.avgdl, k)
        else Wand.taatInBucket(byTerm, idf, oracle.avgdl, k)
      }
      .sortBy(h => (-h.score, h.docId))
      .take(k)
  }

  private val vocabGen: Gen[String] = Gen.oneOf(
    Gen.oneOf(Corpus.stopwords.toIndexedSeq),
    Gen.choose(0, 400).map(Corpus.contentWord),
    Gen.choose(0, 63).map(Corpus.rareMarker),
    Gen.const("document"),
    Gen.const("nosuchterm"))
  private val queryGen: Gen[(String, Int)] = for {
    nTerms <- Gen.choose(1, 5)
    terms <- Gen.listOfN(nTerms, vocabGen)
    k <- Gen.oneOf(1, 3, 10, 50)
  } yield (terms.mkString(" "), k)

  Seq(4, 128).foreach { blockSize =>
    test(s"random queries: WAND == TAAT == oracle at blockSize=$blockSize") {
      val blocks = buildBlocks(blockSize)
      forAllSeeded(queryGen, n = 150) { case (q, k) =>
        val wand = engineTopK(blocks, q, k, wand = true)
          .map(h => (h.docId, h.score))
        val taat = engineTopK(blocks, q, k, wand = false)
          .map(h => (h.docId, h.score))
        val want = oracle.topK(q, k).map(h => (h.docId, h.score)).toSeq
        assert(wand == want, s"WAND != oracle for [$q] k=$k bs=$blockSize")
        assert(taat == want, s"TAAT != oracle for [$q] k=$k bs=$blockSize")
      }
    }
  }

  test("block-level invariance: blockSize 4 and 128 give identical results") {
    val b4 = buildBlocks(4)
    val b128 = buildBlocks(128)
    graft.query.QuerySet.all.foreach { case (name, q) =>
      val r4 = engineTopK(b4, q, 10, wand = true).map(h => (h.docId, h.score))
      val r128 = engineTopK(b128, q, 10, wand = true).map(h => (h.docId, h.score))
      assert(r4 == r128, s"$name differs across block sizes")
    }
  }
}
