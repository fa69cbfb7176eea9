package graft.sync

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.PageRow
import graft.sources.TableIO

/** Nested (expanded) child resources — the reference's `$expand` path:
  * a parent record arrives with its child records embedded (Media per
  * Property, utils.js:328-343 builds the $expand URL) and the destination
  * splits them into parent + child tables in one transaction, replacing
  * a parent's children wholesale on update
  * (lib/sync/dataAdapters/mysql/mysql.js:300-331).
  *
  * Spark shape: the raw frame carries PageRow columns plus one
  * array<struct> column; `run` splits it, syncs the parent through the
  * normal LSM SyncJob, and appends ONLY the delta parents' child rows to
  * `root/children/<name>/` stamped (parent_docid, batch_id) — O(delta),
  * like the parent path.
  *
  * Child liveness needs no separate tombstones: a child row is live iff
  * its (parent_docid, batch_id) pair matches the parent's LIVE docs row —
  * the docs table already is the manifest of which parent version is
  * current, so an updated parent's old children die with the old doc row
  * and a purged parent's children die with the doc. Stale child rows are
  * physically dropped whenever the parent index compacts.
  */
object Children {

  private val PageCols = Seq("url", "warc_ts", "html", "text", "lang")

  /** Split a raw expanded frame into the parent pages and the exploded
    * child rows (child columns flattened, parent_docid attached).
    */
  def split(raw: DataFrame, childCol: String): (Dataset[PageRow], DataFrame) = {
    val spark = raw.sparkSession
    import spark.implicits._
    val parent = raw.select(PageCols.map(col): _*).as[PageRow]
    val children = raw
      .select(xxhash64(col("url")).as("parent_docid"),
        explode(col(childCol)).as("child"))
      .select(col("parent_docid"), col("child.*"))
    (parent, children)
  }

  def childDir(io: TableIO, name: String): String = s"${io.root}/children/$name"

  /** Sync an expanded frame: parent rows through SyncJob, the delta
    * parents' children appended to the child table under the same batch.
    */
  def run(spark: SparkSession, io: TableIO, raw: DataFrame, childCol: String,
          childName: String, batchTs: Timestamp,
          resource: String = "pages"): SyncJob.Result = {
    import spark.implicits._
    val (parent, children) = split(raw, childCol)
    val r = SyncJob.run(spark, io, parent, batchTs, resource)
    val batchId = r.batchId
    val cp = new Checkpoint(spark, io)
    if (!cp.isDone(batchId, "sync", s"child:$childName", "publish")) {
      // delta parents = docs rows written by THIS batch
      val current = Tables.loadCurrent(spark, io).getOrElse(
        throw new IllegalStateException("children: parent sync not published"))
      val deltaParents = current.docs
        .filter($"batch_id" === batchId).select($"docId".as("parent_docid"))
      // O(batch) parent ids — size-adapted like every delta-id set in the
      // LSM write paths (a backfill batch must not broadcast 10⁹ ids); the
      // count is a pruned scan of this batch's own segment only
      val nDelta = deltaParents.count()
      val deltaChildren = children
        .join(Tables.maybeBroadcast(deltaParents, nDelta), Seq("parent_docid"))
        .withColumn("batch_id", lit(batchId))
      io.appendParquet(deltaChildren, childDir(io, childName))
      cp.markDone(batchId, "sync", s"child:$childName", "publish")
    }
    r
  }

  /** Live child rows: (parent_docid, batch_id) must match a live parent
    * doc row (broadcast join against the pruned 2-column docs view).
    */
  def live(spark: SparkSession, io: TableIO, childName: String): DataFrame = {
    import spark.implicits._
    val current = Tables.loadCurrent(spark, io).getOrElse(
      throw new IllegalStateException(s"no published index at ${io.root}"))
    val liveKeys = current.docs
      .select($"docId".as("parent_docid"), $"batch_id")
    io.readParquet(childDir(io, childName))
      .join(liveKeys, Seq("parent_docid", "batch_id"), "left_semi")
  }
}
