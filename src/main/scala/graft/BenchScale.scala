package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.sources.TableIO
import graft.sync.SyncJob

/** Scaling-measurement worker: one fresh JVM per timed run so JIT state,
  * heap history, and session leftovers can't bias the comparison. Warms
  * the full sync path on a small corpus first, then reports ONE timed
  * build plus two CPU-steal probes (a fixed single-thread busy loop timed
  * immediately before and after the build — on this sandbox VM host-side
  * steal can double a wall time at random, and a slow probe flags the
  * window as poisoned). The caller (Bench) interleaves runs across
  * parallelism levels and takes minima, so a steal spike can't land
  * entirely on one level. Invoked by Bench via ProcessBuilder; also usable
  * standalone: `runMain graft.BenchScale <cpus> <docs> <parts>`.
  */
object BenchScale {

  /** Fixed single-thread CPU probe (~0.3s unloaded): xxhash-style mixing
    * over a counter — pure registers, no allocation, no I/O.
    */
  def probeSec(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 60000000) {
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x += i
      i += 1
    }
    if (x == 42L) println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val Array(cpus, docs, parts) = args.map(_.toLong)
    // On a real cluster, disk bandwidth scales with executor count; on one
    // box it does not — measuring on tmpfs keeps the comparison about
    // compute+shuffle scaling rather than a single shared disk.
    val tmpBase = sys.env.getOrElse("GRAFT_SCALE_TMP",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else
        System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpBase/graft-scale-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def build(n: Long): Double = {
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(tmpBase), "graft-scale").toString
      val io = new TableIO(spark, root)
      val t0 = System.nanoTime()
      SyncJob.run(spark, io, Corpus.pages(spark, n, parts.toInt),
        new Timestamp(Corpus.warcTsMillis(n)))
      val sec = (System.nanoTime() - t0) / 1e9
      io.deleteDir(root)
      sec
    }

    build(docs / 16 max 2000) // JIT warmup through the full path
    val p1 = probeSec()
    val sec = build(docs)
    val p2 = probeSec()
    println(f"GRAFT_SCALE cpus=$cpus sec=$sec%.3f probe1=$p1%.3f probe2=$p2%.3f")
    spark.stop()
  }
}
