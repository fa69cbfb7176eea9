package graft.sync

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.CheckpointRow
import graft.sources.TableIO

/** Batch state machine — the internalConfig.json analog.
  *
  * Reference semantics mirrored (cited for behavior, not code):
  *  - batchId grammar `YYYY-MM-DD-T-HH-mm-ss-SSS` + `Z` from the batch
  *    timestamp (lib/sync/utils.js:188-194 convertTimestampToBatchId).
  *  - per-(batch, process, resource, stage) done flags that flip exactly
  *    once; a re-run skips completed stages and resumes mid-batch
  *    (lib/sync/downloader.js:345-425, destinationManager.js:48-165).
  *  - oldest unfinished batch selectable for resume
  *    (lib/sync/utils.js:162-186 getOldestBatchId).
  *
  * Rows append to a parquet log; state = latest row per key. Driver-side
  * only (tiny table).
  */
class Checkpoint(spark: SparkSession, io: TableIO) {
  import spark.implicits._

  private def table() =
    if (io.exists(io.checkpointsDir)) Some(io.readParquet(io.checkpointsDir))
    else None

  def isDone(batchId: String, process: String, resource: String,
             stage: String): Boolean =
    table().exists { df =>
      df.filter(
        $"batch_id" === batchId && $"process" === process &&
        $"resource" === resource && $"stage" === stage && $"done")
        .limit(1).count() > 0
    }

  def markDone(batchId: String, process: String, resource: String,
               stage: String): Unit = {
    val row = CheckpointRow(batchId, process, resource, stage, done = true,
      new Timestamp(System.currentTimeMillis()))
    io.appendParquet(Seq(row).toDF(), io.checkpointsDir)
  }

  /** Oldest batch with any not-done stage for the process (resume target). */
  def oldestUnfinished(process: String): Option[String] =
    table().flatMap { df =>
      val published = df
        .filter($"process" === process && $"stage" === "publish" && $"done")
        .select($"batch_id").distinct()
      val all = df.filter($"process" === process).select($"batch_id").distinct()
      all.join(published, Seq("batch_id"), "left_anti")
        .orderBy($"batch_id".asc).limit(1)
        .as[String].collect().headOption
    }
}

object Checkpoint {
  private val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd-'T'-HH-mm-ss-SSS")
  fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))

  /** Timestamp → batchId, same grammar as the reference's
    * convertTimestampToBatchId (utils.js:188-194): ISO with separators
    * flattened to dashes, trailing Z.
    */
  def toBatchId(ts: Timestamp): String = fmt.format(ts) + "Z"
}
