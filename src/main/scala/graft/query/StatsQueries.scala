package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.PageRow
import graft.sources.TableIO
import graft.sync.Tables

/** Read-model verification — the reference dashboard's production
  * correctness check (src/components/StatsDetails.vue:26-45 +
  * server/index.js:268-287): destination row count and most-recent
  * update timestamp, side by side with the source's, per resource. A
  * drifted destination shows up as in_sync = false and is the operator's
  * cue to run reconcile.
  */
object StatsQueries {

  /** One row: (resource, src_count, dest_count, src_max_ts, dest_max_ts,
    * in_sync). Column-pruned aggregations on both sides — the destination
    * side reads only the docs tables' (docId, warc_ts, batch_id).
    */
  def verify(spark: SparkSession, io: TableIO, source: Dataset[PageRow],
             resource: String = "pages"): DataFrame = {
    import spark.implicits._
    val src = source.agg(
      count(lit(1)).as("src_count"), max($"warc_ts").as("src_max_ts"))
    val dest = Tables.loadCurrent(spark, io) match {
      case Some(t) => t.docs.agg(
        count(lit(1)).as("dest_count"), max($"warc_ts").as("dest_max_ts"))
      case None => Seq((0L, null.asInstanceOf[java.sql.Timestamp]))
        .toDF("dest_count", "dest_max_ts")
    }
    src.crossJoin(dest).select(
      lit(resource).as("resource"),
      $"src_count", $"dest_count", $"src_max_ts", $"dest_max_ts",
      ($"src_count" === $"dest_count" &&
        $"src_max_ts" <=> $"dest_max_ts").as("in_sync"))
  }

  /** Last-k-batches dashboard feed — the reference GraphQL shape the
    * Vue dashboard renders per source (server/index.js:218-267 resolves
    * the most recent sync/purge/reconcile batches with their per-resource
    * counts; StatsDetails.vue lists them newest-first). One row per
    * (process, batch): batch id, driver-level row count, wall millis,
    * result, and error sample — straight off the metrics ledger's
    * driver rows (partitionId = -1), newest k per process.
    */
  def lastBatches(spark: SparkSession, io: TableIO, k: Int = 3): DataFrame = {
    import spark.implicits._
    if (!io.exists(io.metricsDir))
      return Seq.empty[(String, String, Long, Long, String, String)]
        .toDF("process", "batch_id", "rows", "millis", "result", "error")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"process")
      .orderBy($"batch_id".desc, $"result".asc)
    io.readParquet(io.metricsDir)
      .filter($"partitionId" === -1) // driver-level rows only
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"process", $"batch_id", $"rows", $"millis", $"result",
        $"error")
      .orderBy($"process", $"batch_id".desc)
  }
}
