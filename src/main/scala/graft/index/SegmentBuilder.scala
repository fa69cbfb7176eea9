package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DocRow, IndexBlock, PageRow, Posting}
import graft.analysis.Tokenizer
import graft.extract.HtmlText

/** One analyzed page: doc metadata + its term-frequency map. Staged to
  * parquet between the analyze and segment stages so a killed job resumes
  * without re-extracting (reference analog: staged page files decouple
  * download from processing, lib/sync/downloader.js:406-408).
  */
case class AnalyzedPage(
    docId: Long,
    url: String,
    warc_ts: java.sql.Timestamp,
    lang: String,
    doclen: Int,
    tfs: Map[String, Int])

/** Per-partition posting-list construction (SURVEY §7.1 stage ③, north
  * rule "posting-list construction").
  *
  * Plan shape (the one place hash aggregation is wrong — postings must be
  * docId-ascending per (term,bucket) for delta-gap encoding, SURVEY §2.4 A6):
  *
  *   pages --map--> analyzed --flatMap--> postings
  *     --repartition(term,bucket)--> sortWithinPartitions(term,bucket,docId)
  *     --mapPartitions--> streaming block encoder (never materializes a
  *                        whole term's postings: groups stream by key)
  *
  * The (term,bucket) shuffle key IS the skew treatment: bucket = docId
  * range, so a stopword's postings land in numBuckets different reducers.
  */
object SegmentBuilder extends Serializable {

  val BlockSize = 128

  /** Extract + tokenize. The engine always indexes text extracted from
    * `html` — the `text` column is the invariant's ground truth, not an
    * input (byte-identity asserted in tests and checkable via
    * [[verifyExtraction]]).
    */
  def analyze(pages: Dataset[PageRow]): Dataset[AnalyzedPage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    import graft.functions.functions.{extract_text, term_stats}
    // fully columnar: custom codegen'd expressions keep the whole
    // pages→analyzed pipeline in one WholeStageCodegen span (no
    // DeserializeToObject/MapElements seam). xxhash64() uses seed 42 =
    // DocIds.docId. Codegen subexpression elimination evaluates the
    // term_stats struct once per row.
    pages.toDF()
      .select(
        xxhash64(col("url")).as("docId"),
        col("url"), col("warc_ts"), col("lang"),
        term_stats(extract_text(col("html"))).as("ts"))
      .select(col("docId"), col("url"), col("warc_ts"), col("lang"),
        col("ts").getField("doclen").as("doclen"),
        col("ts").getField("tfs").as("tfs"))
      .as[AnalyzedPage]
  }

  /** Count rows violating the byte-identical extraction invariant. */
  def verifyExtraction(pages: Dataset[PageRow]): Long = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.filter(p => HtmlText.extract(p.html) != p.text).count()
  }

  /** docs projection — pure column ops so the parquet read prunes the
    * (large) tfs map column entirely.
    */
  def toDocs(analyzed: org.apache.spark.sql.DataFrame,
             batchId: String): Dataset[DocRow] = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    analyzed.select(col("docId"), col("url"), col("warc_ts"), col("lang"),
      col("doclen"), lit(batchId).as("batch_id")).as[DocRow]
  }

  /** Posting construction as a columnar explode (whole-stage codegen;
    * no Scala-side Map deserialization in the hot path). bucket = top
    * hash bits via shiftrightunsigned — same function as DocIds.bucket.
    */
  def toPostings(analyzed: org.apache.spark.sql.DataFrame): Dataset[Posting] = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    analyzed
      .select(col("docId"), col("doclen"),
        explode(col("tfs")).as(Seq("term", "tf")))
      .select(col("term"),
        // bits=0 must be branched: a 64-bit shiftrightunsigned is a no-op
        // (shift count masked to 6 bits), not zero
        (if (DocIds.bucketBits == 0) lit(0)
         else shiftrightunsigned(col("docId"), 64 - DocIds.bucketBits)
           .cast("int")).as("bucket"),
        col("docId"), col("tf").cast("int").as("tf"),
        col("doclen").as("dl"))
      .as[Posting]
  }

  /** Fail the batch if two urls hashed to the same docId (xxhash64
    * collision). Exact distributed check over a 3-column pruned scan;
    * returns (row count, doclen sum) piggybacked on the same aggregation
    * pass — the merge stage's O(delta) stats arithmetic needs both, and
    * collecting them here saves a whole Spark job per steady-state batch
    * (fixed job overheads, not data volume, dominate small frequent
    * replication batches).
    */
  def checkCollisions(docsLike: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val row = docsLike.select(col("docId"), col("url"), col("doclen"))
      .groupBy("docId").agg(countDistinct("url").as("u"),
        count(lit(1)).as("c"), sum(col("doclen")).as("dl"))
      .agg(sum(col("c")).as("n"), max(col("u")).as("maxu"),
        sum(col("dl")).as("dlsum"), max(col("c")).as("maxc"))
      .head()
    val n = if (row.isNullAt(0)) 0L else row.getLong(0)
    if (n > 0 && row.getLong(1) > 1)
      throw new IllegalStateException(
        "docId collision detected; widen keys to (docId, url) for this corpus")
    // same-url duplicates must have been collapsed upstream
    // (SyncJob.latestPerUrl): a docId twice in one segment double-counts
    // the doc everywhere downstream, so refuse crisply here rather than
    // publish a corrupt segment (free — same aggregation job)
    if (n > 0 && row.getLong(3) > 1)
      throw new IllegalStateException(
        "duplicate rows for one url reached a segment — in-batch " +
          "last-write-wins (latestPerUrl) was bypassed upstream")
    (n, if (n == 0 || row.isNullAt(2)) 0L else row.getLong(2))
  }

  /** Postings → compressed blocks. Shuffles once on (term, bucket), sorts
    * within partitions, then streams groups through the encoder.
    */
  def buildBlocks(postings: Dataset[Posting], batchId: String,
                  numPartitions: Int = 0): Dataset[IndexBlock] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    postings
      .repartition(p, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"docId")
      .mapPartitions(rows => encodePartition(rows, batchId))
  }

  /** Streaming encoder over a (term,bucket,docId)-sorted partition. Holds
    * at most BlockSize postings in memory — a skewed group streams through
    * as a sequence of blocks rather than materializing.
    */
  private[index] def encodePartition(rows: Iterator[Posting],
                                     batchId: String): Iterator[IndexBlock] = {
    new Iterator[IndexBlock] {
      private val it = rows.buffered
      private var curTerm: String = _
      private var curBucket: Int = _
      private var blockId: Int = 0
      private val docIds = new Array[Long](BlockSize)
      private val tfs = new Array[Int](BlockSize)
      private val dls = new Array[Int](BlockSize)

      def hasNext: Boolean = it.hasNext

      def next(): IndexBlock = {
        val head = it.head
        if (head.term != curTerm || head.bucket != curBucket) {
          curTerm = head.term; curBucket = head.bucket; blockId = 0
        }
        var n = 0
        var maxTf = 0
        var minDl = Int.MaxValue
        var tfSum = 0L
        while (n < BlockSize && it.hasNext &&
               it.head.term == curTerm && it.head.bucket == curBucket) {
          val p = it.next()
          docIds(n) = p.docId; tfs(n) = p.tf; dls(n) = p.dl
          if (p.tf > maxTf) maxTf = p.tf
          if (p.dl < minDl) minDl = p.dl
          tfSum += p.tf
          n += 1
        }
        val ids = java.util.Arrays.copyOf(docIds, n)
        val block = IndexBlock(
          curTerm, curBucket, blockId, ids(0), ids(n - 1), n, maxTf, minDl,
          tfSum,
          Codec.encodeDocIds(ids, ids(0)),
          Codec.encodeInts(java.util.Arrays.copyOf(tfs, n)),
          Codec.encodeInts(java.util.Arrays.copyOf(dls, n)),
          batchId)
        blockId += 1
        block
      }
    }
  }

  /** Decode a block back to postings (merge + tests). */
  def decodeBlock(b: IndexBlock): Array[Posting] = {
    val ids = Codec.decodeDocIds(b.docIdsVB, b.count, b.firstDocId)
    val tfs = Codec.decodeInts(b.tfsVB, b.count)
    val dls = Codec.decodeInts(b.dlsVB, b.count)
    Array.tabulate(b.count)(i => Posting(b.term, b.bucket, ids(i), tfs(i), dls(i)))
  }

  /** Re-encode one decoded-and-filtered block in place (same (term,bucket),
    * same blockId) — used by merge's block-level tombstone path, which must
    * keep sibling blocks' docId ranges disjoint.
    */
  def reencodeBlock(template: IndexBlock, ps: Array[Posting]): IndexBlock = {
    require(ps.nonEmpty)
    val ids = ps.map(_.docId)
    IndexBlock(
      template.term, template.bucket, template.blockId, ids(0), ids.last,
      ps.length, ps.map(_.tf).max, ps.map(_.dl).min, ps.map(_.tf.toLong).sum,
      Codec.encodeDocIds(ids, ids(0)),
      Codec.encodeInts(ps.map(_.tf)),
      Codec.encodeInts(ps.map(_.dl)),
      template.batch_id)
  }
}
