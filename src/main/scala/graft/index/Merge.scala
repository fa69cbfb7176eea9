package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CorpusStats, DictRow, DocRow, IndexBlock, Posting}

/** The logical tables of one published index version. */
case class IndexTables(
    docs: Dataset[DocRow],
    index: Dataset[IndexBlock],
    dict: Dataset[DictRow],
    stats: CorpusStats)

/** docs + index plans of a merge, before dict/stats derivation (those are
  * computed from the *written* parquet so the encode shuffle never runs
  * twice — see Tables.writeVersion).
  */
case class MergedData(docs: Dataset[DocRow], index: Dataset[IndexBlock])

/** Distributed merge of a delta segment into the global term-partitioned
  * index (SURVEY §7.1 stage ④; north rule "distributed merge of
  * partition-local segments into a term-partitioned global index").
  *
  * Incremental merge = three disjoint paths over the old index, chosen per
  * block, so a small sync batch never shuffles the whole index:
  *
  *  1. pass-through — (term,bucket) untouched by the delta and docId range
  *     contains no affected doc: block binary is carried verbatim (with
  *     Iceberg this is metadata-only; here the parquet bytes are rewritten
  *     but never decoded or shuffled).
  *  2. in-place rewrite — group untouched but the block's [first,last]
  *     range contains an updated/purged docId: decode, drop those docIds,
  *     re-encode the block alone. Keeps sibling blocks' docId ranges
  *     disjoint (a pooled re-chunk could straddle an untouched sibling).
  *  3. group rebuild — (term,bucket) present in the delta: all its old
  *     blocks decode into a posting pool, union the delta postings, and
  *     re-chunk through the same one-shuffle
  *     repartition(term,bucket)+sortWithinPartitions+encode pipeline as a
  *     fresh build.
  *
  * Affected docIds and delta groups ride to executors as broadcast sorted
  * arrays (binary-searched per block); when a batch is too large to
  * broadcast the merge degrades to a full rebuild via joins — the correct
  * trade at that batch size anyway.
  *
  * Reference analog: Solr `client.add(docs)` + commit replaces documents
  * atomically per batch (lib/sync/dataAdapters/solr/solr.js:80-107);
  * deletes are `deleteByQuery` by id (solr.js:169-185) — here tombstoned
  * docIds drop out of postings during the merge.
  */
object Merge extends Serializable {

  /** Max (affected docIds + delta groups) we broadcast before falling back
    * to a full join-based rebuild.
    */
  val MaxBroadcast = 5000000L

  def fullBuild(spark: SparkSession, deltaDocs: Dataset[DocRow],
                deltaPostings: Dataset[Posting], batchId: String): MergedData =
    MergedData(deltaDocs, SegmentBuilder.buildBlocks(deltaPostings, batchId))

  def merge(
      spark: SparkSession,
      old: Option[IndexTables],
      deltaDocs: Dataset[DocRow],
      deltaPostings: Dataset[Posting],
      purgedDocIds: Dataset[Long],
      batchId: String): MergedData = {
    import spark.implicits._

    old match {
      case None =>
        fullBuild(spark, deltaDocs, deltaPostings, batchId)
      case Some(o) =>
        val deltaIds = deltaDocs.select($"docId").as[Long]
        val affectedDs = deltaIds.union(purgedDocIds).distinct()
        val nAffected = affectedDs.count()
        val groupsDs = deltaPostings.select($"term", $"bucket").distinct()
        val nGroups = groupsDs.count()

        if (nAffected + nGroups > MaxBroadcast) {
          // join-based full rebuild (huge batch): decode everything,
          // anti-join tombstones, rebuild all groups in one shuffle.
          val oldPostings = o.index.flatMap(SegmentBuilder.decodeBlock _)
          val live = oldPostings
            .join(affectedDs.toDF("docId"), Seq("docId"), "left_anti")
            .as[Posting]
          val index = SegmentBuilder.buildBlocks(live.unionByName(deltaPostings), batchId)
          val docs = o.docs
            .join(affectedDs.toDF("docId"), Seq("docId"), "left_anti")
            .as[DocRow].unionByName(deltaDocs)
          MergedData(docs, index)
        } else {
          val affected: Array[Long] = affectedDs.collect().sorted
          val groups: Set[(String, Int)] =
            groupsDs.as[(String, Int)].collect().toSet
          val bAffected = spark.sparkContext.broadcast(affected)
          val bGroups = spark.sparkContext.broadcast(groups)

          def isTouched(b: IndexBlock): Boolean =
            bGroups.value.contains((b.term, b.bucket))
          def overlaps(b: IndexBlock): Boolean =
            rangeHasAny(bAffected.value, b.firstDocId, b.lastDocId)
          def liveOnly(ps: Array[Posting]): Array[Posting] = {
            val a = bAffected.value
            ps.filter(p => java.util.Arrays.binarySearch(a, p.docId) < 0)
          }

          val passThrough = o.index.filter(b => !isTouched(b) && !overlaps(b))
          val rewritten = o.index
            .filter(b => !isTouched(b) && overlaps(b))
            .flatMap { b =>
              val live = liveOnly(SegmentBuilder.decodeBlock(b))
              if (live.isEmpty) None
              else Some(SegmentBuilder.reencodeBlock(b, live))
            }
          val pooled = o.index
            .filter(isTouched _)
            .flatMap(b => liveOnly(SegmentBuilder.decodeBlock(b)))
          val rebuilt =
            SegmentBuilder.buildBlocks(pooled.unionByName(deltaPostings), batchId)
          val index = passThrough.unionByName(rewritten).unionByName(rebuilt)

          val docs = o.docs
            .filter(d => java.util.Arrays.binarySearch(bAffected.value, d.docId) < 0)
            .unionByName(deltaDocs)
          MergedData(docs, index)
        }
    }
  }

  /** Any element of sorted `a` inside the signed range [lo, hi]? (Block
    * ranges never span a bucket, so signed order == unsigned order inside
    * them.)
    */
  private def rangeHasAny(a: Array[Long], lo: Long, hi: Long): Boolean = {
    var i = java.util.Arrays.binarySearch(a, lo)
    if (i < 0) i = -i - 1
    i < a.length && a(i) <= hi
  }

  /** Derive dict + corpus stats from docs/index plans. dict needs only
    * block metadata columns (count, tfSum); docs stats scan one int
    * column. Production path derives these from the written parquet
    * (Tables.writeVersion) so the encode shuffle never re-runs; this
    * in-plan variant serves tests. In production Iceberg both are
    * maintained incrementally.
    */
  def derive(spark: SparkSession, docs: Dataset[DocRow],
             index: Dataset[IndexBlock]): IndexTables = {
    import spark.implicits._
    val dict = index.groupBy($"term")
      .agg(sum($"count").as("df"), sum($"tfSum").as("cf"))
      .as[DictRow]
    val row = docs.agg(count(lit(1)), sum($"doclen")).head()
    val n = row.getLong(0)
    val sumDl = if (row.isNullAt(1)) 0L else row.getLong(1)
    val stats = CorpusStats(n, if (n == 0) 0.0 else sumDl.toDouble / n)
    IndexTables(docs, index, dict, stats)
  }
}
