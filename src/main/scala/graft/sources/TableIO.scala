package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table storage with atomic publish (SURVEY §4 item 5, §7.2).
  *
  * Production target is Iceberg (snapshot commit, MERGE INTO, DELETE
  * WHERE); this sandbox has no Iceberg jar, so the same semantics are
  * provided by a Parquet layout + pointer file:
  *
  * {{{
  * root/
  *   v=<batchId>/{docs,index,dict,stats}/   immutable version directories
  *   current                                text file naming the live version
  *   staging/<batchId>/<stage>/             resumable intermediate outputs
  *   checkpoints/                           append-only parquet (internalConfig analog)
  *   metrics/                               append-only parquet (ors_* analog)
  * }}}
  *
  * Publish = write the full v= dir, then atomically rename current.tmp →
  * current (atomic on local FS and HDFS; on S3 Iceberg's metadata commit
  * plays this role). Readers resolve `current` once and then only touch
  * immutable paths — snapshot isolation, like a Solr commit
  * (reference: lib/sync/dataAdapters/solr/solr.js:104) or a MySQL
  * transaction (mysql/mysql.js:300).
  */
class TableIO(val spark: SparkSession, val root: String) extends Serializable {

  @transient private lazy val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionDir(batchId: String): String = s"$root/v=$batchId"
  def stagingDir(batchId: String, stage: String): String =
    s"$root/staging/$batchId/$stage"
  def checkpointsDir: String = s"$root/checkpoints"
  def metricsDir: String = s"$root/metrics"
  private def currentPath = new Path(s"$root/current")

  def exists(path: String): Boolean = fs.exists(new Path(path))

  /** The live version id, if any version has been published. */
  def currentVersion(): Option[String] = {
    if (!fs.exists(currentPath)) None
    else {
      val in = fs.open(currentPath)
      try {
        val bytes = new Array[Byte](256)
        val n = in.read(bytes)
        Some(new String(bytes, 0, math.max(n, 0), "UTF-8").trim)
      } finally in.close()
    }
  }

  /** Atomically flip the `current` pointer to `batchId`. */
  def publish(batchId: String): Unit = {
    val tmp = new Path(s"$root/current.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
    val out = fs.create(tmp, true)
    try out.write(batchId.getBytes("UTF-8")) finally out.close()
    if (fs.exists(currentPath)) fs.delete(currentPath, false)
    if (!fs.rename(tmp, currentPath))
      throw new IllegalStateException(s"publish: rename failed for $batchId")
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readParquet(path: String): DataFrame = spark.read.parquet(path)

  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  def deleteDir(path: String): Unit = {
    val p = new Path(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Drop all but the newest `keep` version directories (batchIds sort
    * chronologically). keep >= 2 leaves the previous version for readers
    * that resolved `current` just before a publish — the snapshot-GC
    * discipline Iceberg's expire_snapshots provides in production.
    * Reference analog: processed batch files are deleted after success
    * (destinationManager.js:228-229).
    */
  def gcVersions(keep: Int = 2): Unit = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return
    val versions = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v="))
      .sorted
    versions.dropRight(keep).foreach(v => deleteDir(versionDir(v)))
  }

  def writeSmallFile(path: String, content: String): Unit = {
    val p = new Path(path)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readSmallFile(path: String): Option[String] = {
    val p = new Path(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** O(1) directory adoption (staging → version dir). Idempotent: if the
    * destination already exists the move is considered done (a crashed
    * run's rerun). Version dirs are invisible until `current` flips, so
    * adopting staged output is publish-safe. Iceberg analog: committing
    * staged data files into a snapshot without rewrite.
    */
  def moveDir(src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    if (fs.exists(d)) return
    if (!fs.exists(s))
      throw new IllegalStateException(s"moveDir: neither $src nor $dst exists")
    fs.mkdirs(d.getParent)
    if (!fs.rename(s, d))
      throw new IllegalStateException(s"moveDir: rename $src -> $dst failed")
  }
}
