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

  /** The reference dashboard's NESTED last-batches graph
    * (server/index.js:218-267 `withGraphFetched`: each recent batch row
    * carries its per-resource rows, each with per-destination detail) —
    * here one row per (process, batch) of the newest k per process, with
    * a `resources` array of per-resource driver rows, each carrying its
    * `partitions` array of per-shuffle-partition lineage (rows/bytes/
    * terms/postings straight off the metrics ledger).
    *
    * A multi-resource root (SyncJob.runBatch) keeps one ledger per
    * resource sub-root; a plain root is a single resource named by its
    * sync jobs ("pages").
    */
  def lastBatchesNested(spark: SparkSession, io: TableIO,
                        k: Int = 3): DataFrame = {
    import spark.implicits._
    val resourcesDir = s"${io.root}/resources"
    val ledgers: Seq[(String, String)] =
      if (io.exists(resourcesDir)) {
        val p = new org.apache.hadoop.fs.Path(resourcesDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).sorted
          .map(r => r -> s"$resourcesDir/$r/metrics")
      } else Seq("pages" -> io.metricsDir)
    val present = ledgers.filter(l => io.exists(l._2))
    // a root with no ledger yet still flows through the same pipeline on
    // an empty frame, so the empty result carries the SAME schema as the
    // populated one (a feed consumer unions or selects columns either way)
    val all =
      if (present.isEmpty)
        spark.emptyDataset[graft.MetricsRow](
            org.apache.spark.sql.Encoders.product[graft.MetricsRow])
          .toDF().withColumn("resource", lit("pages"))
      else present.map { case (res, dir) =>
        io.readParquet(dir).withColumn("resource", lit(res))
      }.reduce(_.unionByName(_))

    val parts = all.filter($"partitionId" >= 0)
      .groupBy($"process", $"batch_id", $"resource")
      .agg(sort_array(collect_list(struct($"partitionId", $"rows",
        $"bytes", $"terms", $"postings"))).as("partitions"))
    val emptyParts = array().cast(parts.schema("partitions").dataType)
    val perResource = all.filter($"partitionId" === -1)
      .select($"process", $"batch_id", $"resource", $"rows", $"millis",
        $"result", $"error")
      .join(parts, Seq("process", "batch_id", "resource"), "left_outer")
      .withColumn("partitions", coalesce($"partitions", emptyParts))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"process").orderBy($"batch_id".desc)
    perResource
      .groupBy($"process", $"batch_id")
      .agg(
        sum($"rows").as("rows"),
        max($"millis").as("millis"),
        when(array_contains(collect_set($"result"), "error"), "error")
          .otherwise(max($"result")).as("result"),
        sort_array(collect_list(struct($"resource", $"rows", $"millis",
          $"result", $"error", $"partitions"))).as("resources"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .drop("rn")
      .orderBy($"process", $"batch_id".desc)
  }
}
