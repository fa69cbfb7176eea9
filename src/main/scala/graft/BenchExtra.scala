package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.query.{IndexReader, QuerySet}
import graft.sources.TableIO
import graft.sync.SyncJob

/** Supplementary measurements the frozen Bench.scala cannot carry
  * (`Bench`/`Verify` are measurement-frozen; extra benchmarks live in a
  * separate main per the optimization-round contract):
  *
  *  1. BM25 latency, instrumented like Bench's driver-query loop: MIN OF
  *     2 passes per query with CPU + bandwidth probes bracketing the
  *     section, plus the per-stage [[IndexReader.lastProfile]] breakdown
  *     of the 3 slowest queries — a p95 outlier is attributable from
  *     within the record instead of being one unprobed sample.
  *  2. Driver queries through the noop sink (guide §1.4): computes every
  *     column of every row with no sink cost — the operator-isolation
  *     numbers cited in OPTIMIZATION_r06.md.
  *
  * One JSON line out. Usage: `sbt "runMain graft.BenchExtra [latency|queries]"`
  * (default: both), envs as Bench (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_DOCS).
  */
object BenchExtra {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "640000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder("{")

    if (mode == "latency" || mode == "both") {
      val tmpBase =
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
        else System.getProperty("java.io.tmpdir")
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(tmpBase), "graft-bench-extra").toString
      val io = new TableIO(spark, root)
      spark.sparkContext.setJobDescription("bench-extra: corpus index build")
      SyncJob.run(spark, io, Corpus.pages(spark, docs, cpus * 2),
        new Timestamp(Corpus.warcTsMillis(docs)))
      val reader = new IndexReader(spark, root)
      (1 to 2).foreach(_ =>
        QuerySet.all.foreach { case (_, q) => reader.topK(q, 10) })
      val p1 = BenchScale.probeSec()
      val bw1 = BenchScale.bandwidthGBs()
      // two full passes, min per query — one steal spike cannot poison both
      val passes = (1 to 2).map { _ =>
        QuerySet.all.map { case (name, q) =>
          spark.sparkContext.setJobDescription(s"bench-extra: bm25 $name")
          val (_, sec) = time(reader.topK(q, 10))
          (name, sec, IndexReader.lastProfile)
        }
      }
      val p2 = BenchScale.probeSec()
      val bw2 = BenchScale.bandwidthGBs()
      val byQuery = passes.flatten.groupBy(_._1).map { case (n, samples) =>
        val best = samples.minBy(_._2)
        (n, best._2, best._3)
      }.toSeq
      val lat = byQuery.map(_._2).sorted
      val p50 = lat(lat.length / 2)
      val p95 = lat((lat.length * 95) / 100 min (lat.length - 1))
      val slow = byQuery.sortBy(-_._2).take(3).map { case (n, sec, prof) =>
        f"""{"query":"$n","sec":$sec%.3f,"path":"${prof.path}",""" +
          f""""dict_sec":${prof.dictSec}%.3f,"scan_sec":${prof.scanSec}%.3f,""" +
          f""""score_sec":${prof.scoreSec}%.3f}"""
      }.mkString("[", ",", "]")
      out.append(f""""bm25_p50_sec":$p50%.3f,"bm25_p95_sec":$p95%.3f,""")
      out.append(f""""latency_probes":{"cpu_sec":[$p1%.2f,$p2%.2f],""")
      out.append(f""""bw_gbs":[$bw1%.1f,$bw2%.1f],"passes_per_query":2,""")
      out.append(""""aggregation":"min"},""")
      out.append(s""""slowest_profiles":$slow,""")
      io.deleteDir(root)
    }

    if (mode == "queries" || mode == "both") {
      // warm-up mirrors Bench (file listing + codegen init off the clock)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
        catch { case _: Exception => () }
      }
      val names = SparkEntry.queries.toSeq.sortBy(_._1)
      val passes = (1 to 2).map { _ =>
        SparkEntry.clearQueryCaches()
        names.map { case (name, fn) =>
          spark.sparkContext.setJobDescription(s"bench-extra: noop $name")
          val (_, sec) = time {
            try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
            }
          }
          name -> sec
        }.toMap
      }
      val qs = names.map { case (name, _) =>
        "\"" + name + f"""\":${passes.map(_(name)).min}%.3f"""
      }.mkString("{", ",", "}")
      out.append(s""""queries_noop_min2":$qs,""")
    }

    out.append(s""""sf":"$sfDir"}""")
    println(out.toString)
    spark.stop()
  }
}
