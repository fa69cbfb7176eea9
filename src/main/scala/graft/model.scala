package graft

import java.sql.Timestamp

/** Core row types of the engine (schemas: FIXTURES.md §1/§7).
  *
  * Reference analogs (tylercollier/openresync, studied read-only):
  *  - PageRow  ≈ an MLS "record" with a single primary key (`url`) and one
  *    update timestamp (`warc_ts`) — the shape enforced by
  *    lib/sync/utils.js:234-254 (exactly one key, ≥1 timestamp field).
  *  - DocRow   ≈ the relational destination row (MySQL table row).
  *  - IndexBlock ≈ the full-text destination (a Solr core's postings),
  *    here built by us instead of delegated to Solr
  *    (lib/sync/dataAdapters/solr/solr.js:80-107).
  */
/** Input table row — (url, warc_ts, html, text, lang) per BASELINE input_hint. */
case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Per-document metadata kept alongside the index ("relational destination"). */
case class DocRow(
    docId: Long,
    url: String,
    warc_ts: Timestamp,
    lang: String,
    doclen: Int,
    batch_id: String)

/** One posting prior to block assembly. `bucket` is the docId-range salt:
  * blocks never span buckets, so one hot term ("the") splits into
  * NUM_BUCKETS independently processed runs — the salted repartitioning
  * required for skewed terms.
  */
case class Posting(term: String, bucket: Int, docId: Long, tf: Int, dl: Int)

/** A compressed posting block: ≤ blockSize docs of one (term, bucket).
  *
  * docIdsVB = delta-gap + VByte over ascending docIds (first gap is
  * relative to firstDocId); tfsVB / dlsVB = VByte of tf / doclen streams.
  * maxTf / minDl give a query-time block-max bound
  * idf * tfNorm(maxTf, minDl) that stays valid as N/avgdl evolve across
  * incremental syncs (a build-time frozen blockMaxScore would go stale).
  * tfSum lets dict df/cf be recomputed from block metadata only.
  */
case class IndexBlock(
    term: String,
    bucket: Int,
    blockId: Int,
    firstDocId: Long,
    lastDocId: Long,
    count: Int,
    maxTf: Int,
    minDl: Int,
    tfSum: Long,
    docIdsVB: Array[Byte],
    tfsVB: Array[Byte],
    dlsVB: Array[Byte],
    batch_id: String)

/** Term dictionary row (df = #docs containing term, cf = Σ tf). `files`
  * are the index parquet files holding the term's blocks — the dict is a
  * block-pointer directory, so a query opens only its terms' files
  * instead of relying on row-group min/max pruning over every index file
  * (df stays exact under churn: appends add the delta's contribution and
  * subtract the killed docs').
  */
case class DictRow(term: String, df: Long, cf: Long,
                   files: Seq[String] = Seq.empty)

/** Global corpus statistics. `sumDl` is carried so incremental syncs can
  * maintain `avgdl = sumDl / n` with exact integer arithmetic (a float
  * running-average would drift from the oracle's Σdl/n).
  */
case class CorpusStats(n: Long, avgdl: Double, sumDl: Long = 0L)

/** LSM tombstone: docId is dead in every segment whose batch_id sorts
  * before `before` (batchIds are chronologically ordered strings). An
  * update written by batch B records (docId, B): all older occurrences die,
  * B's own survives. A purge records (docId, "~") — "~" sorts after every
  * batchId, so every occurrence dies. The reference analog is Solr's
  * per-commit delete set (lib/sync/dataAdapters/solr/solr.js:169-185);
  * Lucene calls this liveDocs.
  */
case class Tombstone(docId: Long, before: String)

/** Checkpoint row — the internalConfig.json analog (reference:
  * lib/config.js:30-65 + batch objects downloader.js:79-91). One row per
  * (batch, process, resource, stage); `done` flips exactly once.
  */
case class CheckpointRow(
    batch_id: String,
    process: String,
    resource: String,
    stage: String,
    done: Boolean,
    updated_at: Timestamp)

/** Metrics/lineage row — the ors_* stats-table analog
  * (reference: lib/stats/setUp.js:7-142; cumulative counters
  * lib/stats/sync.js:46-60). One row per batch × process × partition.
  */
case class MetricsRow(
    batch_id: String,
    process: String,
    partitionId: Int,
    rows: Long,
    bytes: Long,
    terms: Long,
    postings: Long,
    millis: Long,
    result: String,
    error: String)

/** A scored query hit. */
case class Hit(docId: Long, score: Double)

/** A scored query hit joined back to its document. */
case class ScoredDoc(rank: Int, docId: Long, url: String, score: Double)
