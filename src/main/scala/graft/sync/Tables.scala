package graft.sync

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CorpusStats, DictRow, DocRow, IndexBlock, Posting, Tombstone}
import graft.index.{IndexTables, Merge, SegmentBuilder}
import graft.sources.TableIO

/** LSM version management: a published version is a *manifest* of
  * immutable segments plus a tombstone set, a dictionary, and corpus
  * stats (SURVEY §7.2; north rule "resumable index-segment builds").
  *
  * Write paths, chosen per batch:
  *
  *  - '''initial''' — the staged build IS segment #1: adopt its dirs by
  *    rename (O(1)), derive dict/stats from the written parquet.
  *  - '''append''' (the steady state) — adopt the staged delta as a new
  *    segment, extend the tombstone set, and update dict/stats with exact
  *    integer arithmetic. Data written = O(delta): untouched segments are
  *    *referenced* by the new manifest, never copied (Iceberg
  *    manifest-reuse; the Solr analog is `client.add(docs)` + commit
  *    touching only the delta, lib/sync/dataAdapters/solr/solr.js:80-107).
  *  - '''compact''' — when the manifest holds >= `compactThreshold`
  *    segments, fold everything into one segment via [[Merge.merge]]
  *    (oldest segment = base; pass-through / in-place rewrite / group
  *    rebuild chosen per block). Amortized over the threshold, total merge
  *    I/O stays O(index / threshold) per batch — the Lucene tiered-merge
  *    discipline.
  *
  * Dict exactness under churn: df/cf must match an oracle over *live*
  * docs bit-for-bit (the rank-identity gate), so appends subtract the
  * killed docs' term stats, looked up in the segments' forward tables
  * (`fwd` = the analyzed pages, adopted by rename at zero write cost).
  * That lookup is the one O(corpus-read) pass of an append (2 pruned
  * columns); writes stay O(delta). Production Iceberg prunes it further
  * with bucket(docId) clustering + bloom filters.
  */
object Tables {

  /** Segment count that triggers a compacting sync (overridable via
    * system property for tests, env var for deployments).
    */
  def compactThreshold: Int =
    sys.props.get("graft.compact.segments")
      .orElse(sys.env.get("GRAFT_COMPACT_SEGMENTS"))
      .map(_.toInt).getOrElse(6)

  /** Sorts after every batchId — tombstones with this `before` kill every
    * occurrence (purge); see [[graft.Tombstone]].
    */
  val PurgeSentinel = "~"

  /** Compact when the manifest sprawls OR the tombstone set outgrows a
    * fifth of the live corpus — the latter guards purge-heavy workloads
    * that never add segments (dead postings would otherwise accumulate
    * without bound; Lucene's deletes-percentage merge trigger).
    */
  def needsCompaction(t: IndexTables): Boolean =
    t.segments.size >= compactThreshold ||
      (t.stats.n > 0 && t.tombstoneCount > t.stats.n / 5)

  // ---- load ----------------------------------------------------------

  def load(spark: SparkSession, io: TableIO, version: String): IndexTables = {
    import spark.implicits._
    val (segs, tombCount) = io.readManifest(version)
    val dir = io.versionDir(version)
    val docsRaw = spark.read
      .parquet(segs.map(s => s"${io.segmentDir(s)}/docs"): _*).as[DocRow]
    val index = spark.read
      .parquet(segs.map(s => s"${io.segmentDir(s)}/index"): _*).as[IndexBlock]
    val tombs =
      if (tombCount == 0) spark.emptyDataset[Tombstone]
      else io.readParquet(s"$dir/tombstones").as[Tombstone]
    val dict = io.readParquet(s"$dir/dict").as[DictRow]
    val r = io.readParquet(s"$dir/stats").head()
    val stats = CorpusStats(r.getAs[Long]("n"), r.getAs[Double]("avgdl"),
      r.getAs[Long]("sumDl"))
    IndexTables(version, segs, liveDocs(docsRaw, tombs, tombCount), index,
      tombs, tombCount, dict, stats)
  }

  def loadCurrent(spark: SparkSession, io: TableIO): Option[IndexTables] =
    io.currentVersion().map(v => load(spark, io, v))

  /** Tombstone-filtered view: a doc row written by batch b is live unless
    * a tombstone (docId, before) with b < before exists. No-op (and no
    * join) when the version has no tombstones.
    */
  def liveDocs(docsRaw: Dataset[DocRow], tombs: Dataset[Tombstone],
               tombCount: Long): Dataset[DocRow] = {
    if (tombCount == 0) docsRaw
    else {
      val spark = docsRaw.sparkSession
      import spark.implicits._
      val t = tombs.toDF("t_docId", "t_before")
      docsRaw.join(broadcast(t),
          docsRaw("docId") === col("t_docId") &&
            docsRaw("batch_id") < col("t_before"), "left_anti")
        .as[DocRow]
    }
  }

  /** Forward tables (analyzed pages) of the given segments, with the
    * owning segment id attached (fwd rows carry no batch column; a row
    * surviving in segment s is live-as-of s, so s is the correct
    * tombstone comparand).
    */
  def readFwd(spark: SparkSession, io: TableIO,
              segments: Seq[String]): DataFrame =
    segments.map { s =>
      io.readParquet(s"${io.segmentDir(s)}/fwd").withColumn("seg", lit(s))
    }.reduce(_.unionByName(_))

  // ---- initial build ---------------------------------------------------

  /** Adopt the staged initial build as segment #1 of a fresh index. */
  def writeInitial(spark: SparkSession, io: TableIO, batchId: String,
                   docsDir: String, blocksDir: String,
                   analyzedDir: String): Unit = {
    val seg = io.segmentDir(batchId)
    io.moveDir(docsDir, s"$seg/docs")
    io.moveDir(blocksDir, s"$seg/index")
    io.moveDir(analyzedDir, s"$seg/fwd")
    deriveDictStats(spark, io, batchId, Seq(batchId))
  }

  /** dict + corpus stats from a single freshly written segment (pruned
    * metadata-column scans — the encode shuffle never re-runs), plus the
    * version manifest with an empty tombstone set.
    */
  def deriveDictStats(spark: SparkSession, io: TableIO, ver: String,
                      segments: Seq[String]): Unit = {
    import spark.implicits._
    val dir = io.versionDir(ver)
    val idx = spark.read
      .parquet(segments.map(s => s"${io.segmentDir(s)}/index"): _*)
      .withColumn("f", input_file_name()) // project first: agg args must be deterministic
    io.writeParquet(
      idx.groupBy($"term").agg(sum($"count").as("df"), sum($"tfSum").as("cf"),
        collect_set($"f").as("files")),
      s"$dir/dict")
    val row = spark.read
      .parquet(segments.map(s => s"${io.segmentDir(s)}/docs"): _*)
      .agg(count(lit(1)), sum($"doclen")).head()
    val n = row.getLong(0)
    val sumDl = if (row.isNullAt(1)) 0L else row.getLong(1)
    writeStats(spark, io, ver, n, sumDl)
    io.writeManifest(ver, segments, 0L)
  }

  private def writeStats(spark: SparkSession, io: TableIO, ver: String,
                         n: Long, sumDl: Long): Unit = {
    import spark.implicits._
    val stats = CorpusStats(n, if (n == 0) 0.0 else sumDl.toDouble / n, sumDl)
    io.writeParquet(Seq(stats).toDF(), s"${io.versionDir(ver)}/stats")
  }

  // ---- append (O(delta) incremental sync) ------------------------------

  /** Append a delta segment (and/or a purge) as a new version without
    * touching existing segments. Writes: the adopted delta segment
    * (rename, O(1)), the tombstone set, the dict, one stats row, one
    * manifest — O(delta + vocabulary), never O(index).
    *
    * @param staged (docsDir, blocksDir, analyzedDir) of the staged delta,
    *               or None for a pure purge batch
    */
  def appendVersion(spark: SparkSession, io: TableIO, old: IndexTables,
                    batchId: String, staged: Option[(String, String, String)],
                    purged: Dataset[Long]): Unit = {
    import spark.implicits._
    val seg = io.segmentDir(batchId)
    staged.foreach { case (docsDir, blocksDir, analyzedDir) =>
      io.moveDir(docsDir, s"$seg/docs")
      io.moveDir(blocksDir, s"$seg/index")
      io.moveDir(analyzedDir, s"$seg/fwd")
    }
    val hasDelta = staged.isDefined

    val deltaIds: DataFrame =
      if (hasDelta) io.readParquet(s"$seg/docs").select($"docId")
      else spark.emptyDataset[Long].toDF("docId")
    val affected = deltaIds.union(purged.toDF("docId")).distinct()

    // the delta's doc count + doclen sum and the delta dict ride on the
    // written segment's pruned metadata columns
    val (deltaN, deltaDl) =
      if (!hasDelta) (0L, 0L)
      else {
        val r = io.readParquet(s"$seg/docs")
          .agg(count(lit(1)), sum($"doclen")).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }

    // killed = previously-live rows of affected docIds: their term stats
    // leave the dict, their doclen leaves the corpus stats. A narrow
    // pre-check on the docs tables' docId column decides whether the
    // (wider) fwd lookup is needed at all — a pure-append batch (new urls
    // only, the crawl steady state) skips it entirely.
    val tombsDf = old.tombstones.toDF("t_docId", "t_before")
    val nExisting = spark.read
      .parquet(old.segments.map(s => s"${io.segmentDir(s)}/docs"): _*)
      .select($"docId")
      .join(broadcast(affected), Seq("docId"), "left_semi")
      .count()
    val killed = (
      if (nExisting == 0)
        spark.emptyDataset[(Long, String, Int, Map[String, Int])]
          .toDF("docId", "url", "doclen", "tfs")
      else readFwd(spark, io, old.segments)
        .select($"docId", $"url", $"doclen", $"tfs", $"seg")
        .join(broadcast(affected), Seq("docId"))
        .join(broadcast(tombsDf),
          $"docId" === $"t_docId" && $"seg" < $"t_before", "left_anti")
        .select($"docId", $"url", $"doclen", $"tfs")
      ).persist()
    try {
      // cross-batch xxhash64 collision check: a delta url landing on a
      // previously indexed docId must be the SAME url (an update), else
      // the tombstone would silently drop the old document
      if (hasDelta) {
        val nColl = killed
          .join(io.readParquet(s"$seg/docs")
            .select($"docId", $"url".as("new_url")), Seq("docId"))
          .filter($"url" =!= $"new_url").count()
        if (nColl > 0) throw new IllegalStateException(
          s"docId collision across batches ($nColl urls); widen keys to " +
            "(docId, url) for this corpus")
      }
      val kr = killed.agg(count(lit(1)), sum($"doclen")).head()
      val killedN = kr.getLong(0)
      val killedDl = if (kr.isNullAt(1)) 0L else kr.getLong(1)

      // dict: old ⊕ delta ⊖ killed, exact integer arithmetic. Block-
      // pointer files union in the delta segment's files; dead postings
      // stay physically inside old files until compaction, so the old
      // pointers remain correct (a superset is fine for pruning).
      val dictAdd =
        if (!hasDelta)
          spark.emptyDataset[(String, Long, Long)]
            .toDF("term", "addDf", "addCf")
            .withColumn("addFiles", typedLit(Seq.empty[String]))
        else io.readParquet(s"$seg/index")
          .withColumn("f", input_file_name())
          .groupBy($"term")
          .agg(sum($"count").as("addDf"), sum($"tfSum").as("addCf"),
            collect_set($"f").as("addFiles"))
      val dictSub = killed
        .select(explode($"tfs").as(Seq("term", "tf")))
        .groupBy($"term")
        .agg(count(lit(1)).as("subDf"), sum($"tf").as("subCf"))
      val emptyArr = typedLit(Seq.empty[String])
      val newDict = old.dict.toDF()
        .join(dictAdd, Seq("term"), "full_outer")
        .join(dictSub, Seq("term"), "full_outer")
        .select($"term",
          (coalesce($"df", lit(0L)) + coalesce($"addDf", lit(0L)) -
            coalesce($"subDf", lit(0L))).as("df"),
          (coalesce($"cf", lit(0L)) + coalesce($"addCf", lit(0L)) -
            coalesce($"subCf", lit(0L))).as("cf"),
          array_union(coalesce($"files", emptyArr),
            coalesce($"addFiles", emptyArr)).as("files"))
        .filter($"df" > 0)
      io.writeParquet(newDict, s"${io.versionDir(batchId)}/dict")

      // tombstones: new rows override old rows for the same docId. Two
      // sources: (a) killed = affected ids with a live older occurrence;
      // (b) delta ids that carry an old tombstone (a doc re-added after a
      // purge — the "~" row must soften to `before = batchId`, else the
      // new segment's row stays dead; it can't simply be dropped, the
      // purged segment row is still physically present)
      val revived = deltaIds
        .join(old.tombstones.toDF().select($"docId"), Seq("docId"), "left_semi")
      val newTombRows = killed.select($"docId").union(revived).distinct()
        .join(deltaIds.withColumn("isDelta", lit(1)), Seq("docId"), "left")
        .select($"docId",
          when($"isDelta".isNotNull, lit(batchId))
            .otherwise(lit(PurgeSentinel)).as("before"))
      val keptOld = old.tombstones.toDF()
        .join(broadcast(newTombRows.select($"docId")), Seq("docId"),
          "left_anti")
      val allTombs = keptOld.unionByName(newTombRows).coalesce(1).persist()
      val tombCount = allTombs.count()
      if (tombCount > 0)
        io.writeParquet(allTombs, s"${io.versionDir(batchId)}/tombstones")
      allTombs.unpersist()

      writeStats(spark, io, batchId,
        old.stats.n - killedN + deltaN,
        old.stats.sumDl - killedDl + deltaDl)
      val segs = if (hasDelta) old.segments :+ batchId else old.segments
      io.writeManifest(batchId, segs, tombCount)
    } finally killed.unpersist()
  }

  // ---- compaction -------------------------------------------------------

  /** Fold all segments (plus an optional staged delta and purge set) into
    * one fresh segment via the three-path [[Merge.merge]]: the oldest
    * segment is the base (untouched groups pass through block-verbatim),
    * the younger segments' live postings + the staged delta are the merge
    * delta, and every tombstoned or purged docId is dropped. Resets the
    * tombstone set; dict/stats re-derive from the written parquet.
    */
  def compactVersion(spark: SparkSession, io: TableIO, old: IndexTables,
                     batchId: String,
                     staged: Option[(String, String, String)],
                     purged: Dataset[Long]): Unit = {
    import spark.implicits._
    val baseSeg = old.segments.head
    val tailSegs = old.segments.tail
    val baseDocs = io.readParquet(s"${io.segmentDir(baseSeg)}/docs").as[DocRow]
    val baseIndex =
      io.readParquet(s"${io.segmentDir(baseSeg)}/index").as[IndexBlock]

    val dead: Map[Long, String] =
      old.tombstones.collect().map(t => t.docId -> t.before).toMap
    val bDead = spark.sparkContext.broadcast(dead)

    def liveTailPostings: Dataset[Posting] =
      if (tailSegs.isEmpty) spark.emptyDataset[Posting]
      else spark.read
        .parquet(tailSegs.map(s => s"${io.segmentDir(s)}/index"): _*)
        .as[IndexBlock]
        .flatMap { b =>
          val d = bDead.value
          SegmentBuilder.decodeBlock(b).filter { p =>
            d.get(p.docId).forall(before => !(b.batch_id < before))
          }
        }
    def liveTailDocs: Dataset[DocRow] =
      if (tailSegs.isEmpty) spark.emptyDataset[DocRow]
      else liveDocs(
        spark.read.parquet(tailSegs.map(s => s"${io.segmentDir(s)}/docs"): _*)
          .as[DocRow],
        old.tombstones, old.tombstoneCount)

    val (stagedDocs, stagedPostings, stagedFwd) = staged match {
      case Some((docsDir, blocksDir, analyzedDir)) =>
        (io.readParquet(docsDir).as[DocRow],
          io.readParquet(blocksDir).as[IndexBlock]
            .flatMap(SegmentBuilder.decodeBlock _),
          Some(io.readParquet(analyzedDir)))
      case None =>
        (spark.emptyDataset[DocRow], spark.emptyDataset[Posting], None)
    }
    // overridden = docIds the staged delta re-writes or this batch purges:
    // their tail-segment occurrences must not ride along (no tombstone is
    // written for them — compaction removes the rows physically)
    val overridden = stagedDocs.select($"docId")
      .union(purged.toDF("docId")).distinct()
    val deltaDocs = liveTailDocs
      .join(broadcast(overridden), Seq("docId"), "left_anti").as[DocRow]
      .unionByName(stagedDocs)
    val deltaPostings = liveTailPostings
      .join(broadcast(overridden), Seq("docId"), "left_anti").as[Posting]
      .unionByName(stagedPostings)
    val purgedAll = purged
      .union(old.tombstones.map(_.docId)).distinct()

    val merged = Merge.merge(spark, Some((baseDocs, baseIndex)),
      deltaDocs, deltaPostings, purgedAll, batchId)
    val seg = io.segmentDir(batchId)
    io.writeParquet(merged.docs.toDF(), s"$seg/docs")
    // whole-index xxhash64 collision re-check rides on each compaction
    SegmentBuilder.checkCollisions(io.readParquet(s"$seg/docs"))
    io.writeParquet(merged.index.toDF(), s"$seg/index")

    // fwd of the compacted segment: tombstone-live old fwd rows minus the
    // overridden set, plus the staged delta's fwd — the exact mirror of
    // the docs merge
    val tombsDf = old.tombstones.toDF("t_docId", "t_before")
    val oldFwdLive = readFwd(spark, io, old.segments)
      .join(broadcast(tombsDf),
        $"docId" === $"t_docId" && $"seg" < $"t_before", "left_anti")
      .join(broadcast(overridden), Seq("docId"), "left_anti")
      .drop("seg")
    val fwdNew = stagedFwd match {
      case Some(f) => oldFwdLive.unionByName(f)
      case None => oldFwdLive
    }
    io.writeParquet(fwdNew, s"$seg/fwd")
    deriveDictStats(spark, io, batchId, Seq(batchId))
  }
}
