package graft.cli

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.query.{IndexReader, QuerySet}
import graft.sources.TableIO
import graft.sync.SyncJob

/** BM25 read-path latency profiler: builds one corpus index, then
  * measures the 20-query reference set (warm, per-stage breakdown via
  * [[IndexReader.lastProfile]]) at dict-chain lengths 1 / 2 / 4 — the
  * attribution tool for latency drift as the LSM accumulates segments
  * and dict links between compactions.
  *
  * Run in a FRESH fixed-heap JVM (the resident sbt JVM's heap geometry
  * poisons heavy measurements): `java -Xmx8g -cp <cp> graft.cli.ProfileQueries
  * [docs] [cores]`.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val docs = args.lift(0).map(_.toLong).getOrElse(640000L)
    val cores = args.lift(1).getOrElse("32")
    val tmpBase =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(tmpBase), "graft-prof").toString
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpBase/graft-prof-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val io = new TableIO(spark, root)
    SyncJob.run(spark, io, Corpus.pages(spark, docs, 64),
      new Timestamp(Corpus.warcTsMillis(docs)))

    def inc(i: Int): Unit = {
      val lo = docs + (i - 1) * (docs / 100)
      val hi = docs + i * (docs / 100)
      SyncJob.run(spark, io, Corpus.pagesRange(spark, lo, hi, 64),
        new Timestamp(Corpus.warcTsMillis(hi)))
    }

    def measure(label: String): Unit = {
      val reader = new IndexReader(spark, root)
      (1 to 2).foreach(_ =>
        QuerySet.all.foreach { case (_, q) => reader.topK(q, 10) })
      val profs = QuerySet.all.map { case (_, q) =>
        val t0 = System.nanoTime()
        reader.topK(q, 10)
        ((System.nanoTime() - t0) / 1e9, IndexReader.lastProfile)
      }
      val lat = profs.map(_._1).sorted
      def mean(f: IndexReader.QueryProfile => Double): Double =
        profs.map(p => f(p._2)).sum / profs.size
      val paths = profs.map(_._2.path).groupBy(identity)
        .map { case (k, v) => s"$k=${v.size}" }.mkString(",")
      println(f"PROFILE $label p50=${lat(lat.length / 2)}%.3f " +
        f"p95=${lat((lat.length * 95) / 100 min (lat.length - 1))}%.3f " +
        f"mean_dict=${mean(_.dictSec)}%.3f mean_scan=${mean(_.scanSec)}%.3f " +
        f"mean_score=${mean(_.scoreSec)}%.3f paths=$paths")
    }

    measure("chain1-seg1")
    inc(1)
    measure("chain2-seg2")
    inc(2); inc(3)
    measure("chain4-seg4")
    io.deleteDir(root)
    spark.stop()
  }
}
