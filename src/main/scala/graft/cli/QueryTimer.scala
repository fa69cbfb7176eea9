package graft.cli

import org.apache.spark.sql.SparkSession

/** Time named SparkEntry queries in the GIVEN order within one session
  * (no cache clearing between them) — the attribution tool for shared
  * pipeline caches: running q_dedup_minhash before q_dedup_jaccard
  * splits candidate-build cost from verifier cost. `--clear` clears the
  * per-(session,dir) caches before each query instead.
  *
  * Usage: `runMain graft.cli.QueryTimer [--clear] <query> [query...]`
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val clear = args.contains("--clear")
    val names = args.filterNot(_ == "--clear")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-timer")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up like Bench's (file listing + codegen init)
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Exception => () }
    }
    spark.range(100000).selectExpr("sum(id * 3)").collect()
    // two rounds: round 2 is JIT/codegen-warm
    (1 to 2).foreach { round =>
      graft.SparkEntry.clearQueryCaches()
      names.foreach { n =>
        if (clear) graft.SparkEntry.clearQueryCaches()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"TIMER round=$round $n ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
