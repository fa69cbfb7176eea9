package graft

import java.sql.Timestamp
import graft.corpus.Corpus
import graft.oracle.NaiveIndex
import graft.query.{IndexReader, QuerySet}
import graft.sources.TableIO
import graft.sync.{PurgeJob, SyncJob}

/** Merge churn stress: many small batches of adds + updates + purges,
  * asserting after every batch that the incrementally-merged index equals
  * a from-scratch oracle over the live row set. Exercises all three merge
  * paths (pass-through, in-place rewrite, group rebuild) repeatedly and
  * in combination — the most intricate logic in the engine.
  */
class MergeChurnSpec extends SparkTestBase {

  val N = 500

  test("8 churn batches: incremental index == full oracle after each") {
    val root = tmpDir("graft-churn")
    val io = new TableIO(spark, root)

    // live state: url index -> (text generation, warc_ts millis-index);
    // changed rows always carry fresh timestamps, like real replication
    val gen = scala.collection.mutable.Map.empty[Long, Int]
    val tsOf = scala.collection.mutable.Map.empty[Long, Long]
    (0 until N).foreach { i => gen(i.toLong) = 0; tsOf(i.toLong) = i.toLong }
    var clock = N.toLong

    def renderRow(i: Long, g: Int, ts: Long): PageRow = {
      val base0 = Corpus.row(i)
      val base = base0.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(ts)))
      if (g == 0) base
      else {
        val newText = base.text + s"\nrevision marker g$g edition"
        val esc = newText.split("\n", -1).map(l =>
          "<p>" + l.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;") + "</p>").mkString
        base.copy(
          text = newText,
          html = (s"<html><head><title>doc $i</title></head><body>$esc" +
            "</body></html>").getBytes("UTF-8"))
      }
    }

    def liveRows(): Seq[PageRow] =
      gen.toSeq.sortBy(_._1).map { case (i, g) => renderRow(i, g, tsOf(i)) }

    import spark.implicits._
    // initial build
    SyncJob.run(spark, io, spark.createDataset(liveRows()),
      new Timestamp(Corpus.warcTsMillis(clock)))

    val rng = new scala.util.Random(7)
    (1 to 8).foreach { round =>
      clock += 100000
      // mutate: ~20 updates, ~10 deletes, ~15 adds (new ids beyond N)
      val updates = (0 until 20).map(_ => rng.nextInt(N).toLong).distinct
        .filter(gen.contains)
      updates.foreach { i => gen(i) = gen(i) + 1; tsOf(i) = clock + (i % 997) }
      val adds = (0 until 15).map(_ => N.toLong + rng.nextInt(4 * N))
        .distinct.filterNot(gen.contains)
      adds.foreach { i => gen(i) = 0; tsOf(i) = clock + (i % 997) }
      val deletable = gen.keys.toSeq.sorted
      val deletes = (0 until 10).map(_ => deletable(rng.nextInt(deletable.size)))
        .distinct.take(math.max(deletable.size - 10, 0) min 10)
      deletes.foreach { i => gen.remove(i); tsOf.remove(i) }

      // the churned rows carry warc_ts beyond the last batch; sync picks
      // them up via the watermark, purge drops the deleted urls
      val live = liveRows()
      val ds = spark.createDataset(live)
      SyncJob.run(spark, io, ds,
        new Timestamp(Corpus.warcTsMillis(clock + 1000)))
      PurgeJob.run(spark, io, ds,
        new Timestamp(Corpus.warcTsMillis(clock + 1)))

      val oracle = new NaiveIndex(live)
      val reader = new IndexReader(spark, root)
      assert(reader.stats.n == oracle.n, s"round $round: doc count")
      assert(reader.stats.avgdl == oracle.avgdl, s"round $round: avgdl")
      (QuerySet.all.take(6) :+ ("qrev" -> "revision marker")).foreach {
        case (name, q) =>
          val got = reader.topK(q, 10).map(h => (h.docId, h.score)).toSeq
          val want = oracle.topK(q, 10).map(h => (h.docId, h.score)).toSeq
          assert(got == want, s"round $round $name diverged")
      }
    }
  }

  /** The updated rows must need re-rendered html for the invariant; check
    * the helper keeps extract(html) == text.
    */
  test("churn row rendering preserves the extraction invariant") {
    val p = {
      val base = Corpus.row(5L)
      val newText = base.text + "\nrevision marker g3 edition"
      val esc = newText.split("\n", -1).map(l =>
        "<p>" + l.replace("&", "&amp;").replace("<", "&lt;")
          .replace(">", "&gt;") + "</p>").mkString
      base.copy(text = newText,
        html = (s"<html><head><title>doc 5</title></head><body>$esc" +
          "</body></html>").getBytes("UTF-8"))
    }
    assert(graft.extract.HtmlText.extract(p.html) == p.text)
  }
}
