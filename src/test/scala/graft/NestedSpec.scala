package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.sources.TableIO
import graft.sync.{Children, PurgeJob}

/** Nested child resources ($expand analog): split, delta-only child
  * writes, wholesale replacement on parent update, cascade on purge.
  */
class NestedSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))

  /** Raw expanded frame: each page carries `gen` media children. */
  private def raw(n: Int, gen: Int, tsShift: Long = 0) =
    spark.createDataset(Corpus.localRows(n)).toDF()
      .withColumn("warc_ts",
        if (tsShift == 0) col("warc_ts")
        else lit(new Timestamp(Corpus.warcTsMillis(tsShift))))
      .withColumn("idx", expr("cast(split(url, '/')[4] as long)"))
      .withColumn("media", expr(
        s"transform(sequence(1, ${gen + 1}), j -> named_struct(" +
          s"'media_url', concat(url, '/media/', j, '-g$gen'), " +
          s"'order_idx', j))"))
      .drop("idx")

  test("expand: split + delta child writes + replacement + purge cascade") {
    val root = tmpDir("graft-nested")
    val io = new TableIO(spark, root)
    val n = 200

    // initial: every parent has 1 child (gen 0)
    val r1 = Children.run(spark, io, raw(n, 0), "media", "media", ts(n))
    assert(r1.deltaRows == n)
    val live1 = Children.live(spark, io, "media")
    assert(live1.count() == n)

    // update parents 0..19 (fresh warc_ts): their children become gen-1
    // (2 rows each), everyone else keeps gen-0
    val upd = raw(n, 1, tsShift = 10L * n)
      .filter(expr("cast(split(url, '/')[4] as long) < 20"))
    val r2 = Children.run(spark, io, upd, "media", "media", ts(10L * n + 1))
    assert(r2.deltaRows == 20)
    val live2 = Children.live(spark, io, "media").cache()
    assert(live2.count() == (n - 20) + 20 * 2)
    assert(live2.filter(col("media_url").contains("-g1")).count() == 40)
    // no stale gen-0 children for the updated parents
    val updIds = (0 until 20).map(i => graft.index.DocIds.docId(Corpus.url(i.toLong)))
    assert(live2.filter(col("parent_docid").isin(updIds: _*) &&
      col("media_url").contains("-g0")).count() == 0)
    live2.unpersist()

    // purge parents 100..199: their children vanish with them
    val keep = Corpus.localRows(n).filter(p =>
      p.url.split("/").last.toLong < 100)
    PurgeJob.run(spark, io, spark.createDataset(keep), ts(20L * n))
    val live3 = Children.live(spark, io, "media")
    assert(live3.count() == 80 + 20 * 2)
    assert(live3.select(max(col("parent_docid").isin(
      (100 until 200).map(i => graft.index.DocIds.docId(Corpus.url(i.toLong))): _*)
      .cast("int"))).head().getInt(0) == 0)
  }
}
