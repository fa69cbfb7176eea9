package graft

import java.sql.Timestamp
import graft.corpus.Corpus
import graft.index.{DocIds, Positional}
import graft.query.{Bm25, IndexReader, Phrase}
import graft.sources.TableIO
import graft.sync.{Metrics, PurgeJob, SyncJob}

/** Positional index + phrase query vs a naive in-memory phrase oracle:
  * the flat single-dir path, the streaming-cursor memory bound, and the
  * maintained (base + delta, docs-join liveness) LSM path under churn.
  */
class PhraseSpec extends SparkTestBase {
  import spark.implicits._

  val N = 600
  lazy val posDir: String = {
    val d = tmpDir("graft-posidx") + "/pos"
    Positional.writeBlocks(Corpus.pages(spark, N, 4), d)
    d
  }

  /** Naive oracle over an explicit live-row set. */
  private def oraclePhraseOver(rows: Seq[PageRow], phrase: String,
                               k: Int): Seq[Hit] = {
    val terms = graft.analysis.Tokenizer.tokenize(phrase).toSeq
    val docs = rows.map { p =>
      (DocIds.docId(p.url), graft.analysis.Tokenizer.tokenize(p.text))
    }
    val n = rows.size.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val matches = docs.flatMap { case (docId, toks) =>
      var tf = 0
      var i = 0
      while (i + terms.length <= toks.length) {
        var ok = true
        var j = 0
        while (ok && j < terms.length) { ok = toks(i + j) == terms(j); j += 1 }
        if (ok) tf += 1
        i += 1
      }
      if (tf > 0) Some((docId, toks.length, tf)) else None
    }
    if (matches.isEmpty) return Seq.empty
    val idf = Bm25.idf(n, matches.length.toLong)
    matches.map { case (d, dl, tf) => Hit(d, Bm25.termScore(idf, tf, dl, avgdl)) }
      .sortBy(h => (-h.score, h.docId))
      .take(k)
  }

  private def oraclePhrase(phrase: String, k: Int): Seq[Hit] =
    oraclePhraseOver(Corpus.localRows(N), phrase, k)

  private def engine(phrase: String, k: Int): Seq[Hit] = {
    val docs = Corpus.localRows(N)
    val n = N.toLong
    val avgdl = docs.map(p =>
      graft.analysis.Tokenizer.tokenize(p.text).length.toLong).sum.toDouble / n
    Phrase.topK(spark, posDir, phrase, k, n, avgdl).toSeq
  }

  // phrases that exist in the corpus grammar: pick real bigrams from doc 0
  lazy val samplePhrases: Seq[String] = {
    val toks = graft.analysis.Tokenizer.tokenize(Corpus.text(0))
    Seq(
      toks.slice(1, 3).mkString(" "),   // real bigram from doc 0 body
      toks.slice(2, 5).mkString(" "),   // real trigram
      "document 7",                      // title-line phrase (unique doc)
      "the the",                         // stopword bigram
      "zzz yyy")                         // no-hit phrase
  }

  test("phrase top-k matches the naive oracle") {
    samplePhrases.foreach { ph =>
      val got = engine(ph, 10).map(h => (h.docId, h.score))
      val want = oraclePhrase(ph, 10).map(h => (h.docId, h.score))
      assert(got == want, s"phrase [$ph] diverged")
    }
  }

  test("title phrase finds exactly its document") {
    val got = engine("document 7", 10)
    assert(got.length == 1)
    assert(got.head.docId == DocIds.docId(Corpus.url(7L)))
  }

  test("no-hit phrase returns empty") {
    assert(engine("zzz yyy", 10).isEmpty)
  }

  test("positional block roundtrip preserves positions") {
    val toks = graft.analysis.Tokenizer.tokenize(Corpus.text(3))
    val want = toks.zipWithIndex.groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).toSeq }
    import spark.implicits._
    val blocks = spark.read.parquet(posDir).as[graft.index.PosBlock]
    val docId = DocIds.docId(Corpus.url(3L))
    val got = blocks.collect()
      .flatMap(Positional.decodeBlock)
      .collect { case (d, _, ps) if d == docId => ps }
    // reconstruct per-term positions for doc 3 from the index
    val gotByTerm = blocks.collect().flatMap { b =>
      Positional.decodeBlock(b).collect {
        case (d, _, ps) if d == docId => b.term -> ps.toSeq
      }
    }.toMap
    want.foreach { case (t, ps) =>
      assert(gotByTerm(t) == ps, s"positions mismatch for term $t")
    }
    assert(got.nonEmpty)
  }

  test("stopword phrase: cursors keep decoded positions O(terms × block)") {
    // two buckets (bucketBits=1, the floor) concentrate the postings: the
    // r3 code would decode BOTH stopword terms' full position lists
    // (~hundreds of thousands of positions) into per-term maps in one
    // task; the cursor intersection must keep only a couple of 128-doc
    // blocks resident
    val prev = sys.props.get("graft.docid.bucketBits")
    sys.props("graft.docid.bucketBits") = "1"
    DocIds.refreshBucketBits()
    try {
      val big = 12000
      val dir = tmpDir("graft-posbig") + "/pos"
      Positional.writeBlocks(Corpus.pages(spark, big, 8), dir)
      val rows = Corpus.localRows(big)
      val n = big.toLong
      val avgdl = rows.map(p =>
        graft.analysis.Tokenizer.tokenize(p.text).length.toLong).sum.toDouble / n
      // total positions of the two stopwords (the memory the old code held)
      val totalPositions = rows.iterator.map(p =>
        graft.analysis.Tokenizer.tokenize(p.text)
          .count(t => t == "the" || t == "of").toLong).sum
      assert(totalPositions > 200000L, s"corpus too small: $totalPositions")
      Phrase.resetResidentTracking()
      val got = Phrase.topK(spark, dir, "of the", 10, n, avgdl).toSeq
        .map(h => (h.docId, h.score))
      val want = oraclePhraseOver(rows, "of the", 10).map(h => (h.docId, h.score))
      assert(got == want, "stopword phrase diverged")
      val resident = Phrase.maxResidentPositions.get()
      assert(resident > 0)
      assert(resident < totalPositions / 20,
        s"cursors held $resident positions resident of $totalPositions " +
          "total — not streaming")
      // match-tuple residency: with bucketBits=1 one bucket holds
      // thousands of "of the" matches, but the scoring path must buffer
      // only its bounded heap + flush run (O(k)), never the bucket's
      // matches (the r4 shape did ms.toArray.sortBy — O(bucket) resident)
      val matchCount = oraclePhraseOver(rows, "of the", Int.MaxValue).length
      assert(matchCount > 3000, s"corpus too small: $matchCount matches")
      val mres = Phrase.maxResidentMatches.get()
      assert(mres > 0)
      assert(mres <= 2L * 10 + 1,
        s"scoring buffered $mres match tuples of $matchCount — not O(k)")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.docid.bucketBits") = v
        case None => sys.props.remove("graft.docid.bucketBits")
      }
      DocIds.refreshBucketBits()
    }
  }

  test("stopword phrase: compressed working set is O(terms x block)") {
    // the demultiplexed doc-major stream holds at most one pending +
    // one in-flight compressed block per phrase term — NOT the bucket
    // slice the r5 shape materialized (bs.map(_.block).toArray), whose
    // residency scaled 1/2^bucketBits with the index. The bound is now
    // independent of bucket width and corpus size.
    val prev = sys.props.get("graft.docid.bucketBits")
    sys.props("graft.docid.bucketBits") = "4"
    DocIds.refreshBucketBits()
    try {
      val big = 12000
      val dir = tmpDir("graft-posslice") + "/pos"
      Positional.writeBlocks(Corpus.pages(spark, big, 8), dir)
      val rows = Corpus.localRows(big)
      val n = big.toLong
      val avgdl = rows.map(p =>
        graft.analysis.Tokenizer.tokenize(p.text).length.toLong).sum.toDouble / n
      import spark.implicits._
      val all = spark.read.parquet(dir).as[graft.index.PosBlock].collect()
      def sz(b: graft.index.PosBlock): Long =
        (b.docIdsVB.length + b.tfsVB.length + b.dlsVB.length +
          b.posVB.length).toLong
      val termBytes = all.iterator
        .filter(b => b.term == "of" || b.term == "the").map(sz).sum
      val indexBytes = all.iterator.map(sz).sum
      assert(termBytes > 100000L, s"corpus too small: $termBytes bytes")
      Phrase.resetResidentTracking()
      val got = Phrase.topK(spark, dir, "of the", 10, n, avgdl).toSeq
        .map(h => (h.docId, h.score))
      val want = oraclePhraseOver(rows, "of the", 10).map(h => (h.docId, h.score))
      assert(got == want, "stopword phrase diverged at bucketBits=4")
      val res = Phrase.maxResidentCompressedBytes.get()
      val maxBlock = all.iterator
        .filter(b => b.term == "of" || b.term == "the").map(sz).max
      assert(res > 0)
      // 2 distinct terms x (1 pending + 1 in flight) with 2x headroom
      assert(res <= 8 * maxBlock,
        s"one task held $res compressed bytes vs largest block $maxBlock " +
          "— the demux is buffering more than O(terms x block)")
      assert(res <= termBytes / 8,
        s"one task held $res compressed bytes of the terms' $termBytes — " +
          "worse than even the old 1/2^bits bucket slice")
      assert(res < indexBytes / 20,
        s"one task held $res of the index's $indexBytes compressed bytes")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.docid.bucketBits") = v
        case None => sys.props.remove("graft.docid.bucketBits")
      }
      DocIds.refreshBucketBits()
    }
  }

  test("maintained posindex: purge + sync answered live, gaps refuse") {
    val root = tmpDir("graft-poslsm")
    val io = new TableIO(spark, root)
    val M = 500
    val rows = Corpus.localRows(M)
    def urlIdx(p: PageRow): Int = p.url.split("/").last.toInt
    def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
    SyncJob.run(spark, io, spark.createDataset(rows), ts(M))

    // base built from the live snapshot, stamped with the current version
    Positional.build(spark, spark.createDataset(rows), s"$root/posindex",
      io.currentVersion())

    def phrase(q: String, live: Seq[PageRow]): Unit = {
      val reader = new IndexReader(spark, root)
      val got = Phrase.topKLive(spark, io, s"$root/posindex", q, 10, reader)
        .toSeq.map(h => (h.docId, h.score))
      val want = oraclePhraseOver(live, q, 10).map(h => (h.docId, h.score))
      assert(got == want, s"phrase [$q] diverged (live=${live.size})")
    }
    phrase("document 7", rows)

    // purge docs >= 450: NO index-pos rerun — the docs-join liveness must
    // exclude them (both from results and from the phrase df)
    val kept = rows.filter(urlIdx(_) < 450)
    PurgeJob.run(spark, io, spark.createDataset(kept), ts(M + 1))
    phrase("the the", kept)
    phrase("document 455", kept) // purged doc's title: must be gone
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 455", 10,
      new IndexReader(spark, root)).isEmpty)

    // sync an update (doc 7 rewritten) + 10 new docs: the delta's pos
    // blocks ride along automatically; old doc-7 positions are stale and
    // must not answer
    val updated = kept.map { p =>
      if (urlIdx(p) == 7)
        p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(7L + 20L * M)),
          html = Corpus.html(9999L), text = Corpus.text(9999L))
      else p
    }
    val added = Corpus.localRows(M + 10).drop(M).zipWithIndex.map {
      case (p, j) =>
        p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(21L * M + j)))
    }
    SyncJob.run(spark, io, spark.createDataset(updated ++ added), ts(22L * M))
    val live2 = updated ++ added
    // doc 7's OLD title phrase must be dead; its NEW text must answer;
    // the added docs' titles must answer
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 7", 10,
      new IndexReader(spark, root)).isEmpty)
    phrase("document 9999", live2)
    phrase(s"document ${M + 5}", live2)
    phrase("the the", live2)

    // fold: base + deltas collapse to ONE live base stamped with the
    // current version; answers unchanged, deltas gone. Before folding,
    // stash a copy of one delta dir to simulate a crash-between-renames
    // later (fold swaps the base, then deletes consumed deltas — a crash
    // between the two leaves a delta subsumed by the new base).
    val deltaNames = io.listDirNames(s"$root/posindex/delta")
    assert(deltaNames.nonEmpty)
    val lingering = deltaNames.head
    val fsPre = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fsPre,
      new org.apache.hadoop.fs.Path(s"$root/posindex/delta/$lingering"),
      fsPre, new org.apache.hadoop.fs.Path(s"$root/posindex/delta-stash"),
      false, spark.sparkContext.hadoopConfiguration)
    Phrase.foldPosindex(spark, io, s"$root/posindex")
    assert(Phrase.sources(spark, io, s"$root/posindex").size == 1,
      "fold must leave a single base source")
    assert(Positional.builtFrom(spark, s"$root/posindex/base")
      .contains(io.currentVersion().get))
    phrase("document 9999", live2)
    phrase("the the", live2)
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 7", 10,
      new IndexReader(spark, root)).isEmpty,
      "folded base must not resurrect out-stamped entries")

    // crashed fold: restore the consumed delta (as if the fold died
    // between the base swap and the delta deletes). Its stamp <= the new
    // base's stamp, so sources() must drop it as subsumed — a doc must
    // NOT double-count via the lingering delta + the folded base
    fsPre.rename(new org.apache.hadoop.fs.Path(s"$root/posindex/delta-stash"),
      new org.apache.hadoop.fs.Path(s"$root/posindex/delta/$lingering"))
    assert(Phrase.sources(spark, io, s"$root/posindex").size == 1,
      "a delta subsumed by the base must be dropped (crashed-fold healing)")
    phrase("document 9999", live2)
    phrase("the the", live2)
    fsPre.delete(
      new org.apache.hadoop.fs.Path(s"$root/posindex/delta/$lingering"), true)

    // coverage gap: a batch synced with the posindex base REMOVED has no
    // delta — phrase must refuse crisply, not silently miss docs
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/posindex/base"),
      new org.apache.hadoop.fs.Path(s"$root/posindex/base.hidden"))
    val more = live2 ++ Corpus.localRows(M + 12).drop(M + 10).zipWithIndex
      .map { case (p, j) =>
        p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(23L * M + j)))
      }
    SyncJob.run(spark, io, spark.createDataset(more), ts(24L * M))
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/posindex/base.hidden"),
      new org.apache.hadoop.fs.Path(s"$root/posindex/base"))
    val e = intercept[IllegalStateException] {
      Phrase.topKLive(spark, io, s"$root/posindex", "document 7", 10,
        new IndexReader(spark, root))
    }
    assert(e.getMessage.contains("does not cover"), e.getMessage)
  }

  test("stale reader: concurrent publish/fold can never double-count") {
    // ADVICE r4 #3: a delta adopted AFTER a reader's snapshot (stamp >
    // reader.version) used to let an UPDATED doc pass liveness for both
    // its old source and the new delta — topKLive must answer the
    // reader's snapshot exactly (new deltas excluded), and refuse
    // crisply once a fold has consumed the old sources
    val root = tmpDir("graft-posstale")
    val io = new TableIO(spark, root)
    val M = 300
    val rows = Corpus.localRows(M)
    def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
    SyncJob.run(spark, io, spark.createDataset(rows), ts(M))
    Positional.build(spark, spark.createDataset(rows), s"$root/posindex",
      io.currentVersion())
    val stale = new IndexReader(spark, root) // snapshot V1

    // doc 7 is rewritten by a later publish (delta stamped V2 > V1)
    val updated = rows.map { p =>
      if (p.url.split("/").last.toInt == 7)
        p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(7L + 20L * M)),
          html = Corpus.html(8888L), text = Corpus.text(8888L))
      else p
    }
    SyncJob.run(spark, io, spark.createDataset(updated), ts(22L * M))

    // the stale reader answers ITS snapshot: old doc-7 content present
    // exactly once, new content invisible — not a mix, never a double
    val old7 = Phrase.topKLive(spark, io, s"$root/posindex", "document 7",
      10, stale)
    assert(old7.length == 1, s"expected the V1 doc once, got ${old7.length}")
    assert(old7.head.docId == DocIds.docId(Corpus.url(7L)))
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 8888",
      10, stale).isEmpty, "a post-snapshot delta leaked into a stale reader")
    // a fresh reader sees the update
    val fresh = new IndexReader(spark, root)
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 7",
      10, fresh).isEmpty)
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 8888",
      10, fresh).length == 1)

    // after a fold (base stamped V2 > V1) the stale snapshot is
    // unanswerable — refuse crisply, never silently answer V2
    Phrase.foldPosindex(spark, io, s"$root/posindex")
    val e = intercept[IllegalStateException] {
      Phrase.topKLive(spark, io, s"$root/posindex", "document 7", 10, stale)
    }
    assert(e.getMessage.contains("newer"), e.getMessage)
    assert(Phrase.topKLive(spark, io, s"$root/posindex", "document 8888",
      10, new IndexReader(spark, root)).length == 1)
  }

  test("posindex deltas auto-fold at the compaction threshold") {
    // the dict-chain / segment rule mirrored: a deployment that never
    // runs compact-pos must not degrade phrase reads linearly in batch
    // count — SyncJob's publish stage folds when delta dirs reach the
    // threshold (it already holds the single-flight lock)
    val prev = sys.props.get("graft.compact.segments")
    sys.props("graft.compact.segments") = "3"
    try {
      val root = tmpDir("graft-posautofold")
      val io = new TableIO(spark, root)
      val M = 200
      def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
      SyncJob.run(spark, io, spark.createDataset(Corpus.localRows(M)), ts(M))
      val v0 = io.currentVersion().get
      Positional.build(spark, spark.createDataset(Corpus.localRows(M)),
        s"$root/posindex", io.currentVersion())
      (1 to 5).foreach { r =>
        val all = Corpus.localRows(M + 5 * r).zipWithIndex.map { case (p, i) =>
          if (i < M + 5 * (r - 1)) p
          else p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(40L * M + i)))
        }
        SyncJob.run(spark, io, spark.createDataset(all), ts(50L * M + r))
        val nDeltas = io.listDirNames(s"$root/posindex/delta").size
        assert(nDeltas < 3,
          s"after sync $r: $nDeltas posindex deltas — auto-fold missing")
      }
      // a fold ran: the base is stamped past the initial version
      val stamp = Positional.builtFrom(spark, s"$root/posindex/base").get
      assert(stamp > v0, s"base stamp $stamp not advanced past $v0")
      // and phrase answers over the final live set stay exact
      val live = Corpus.localRows(M + 25).zipWithIndex.map { case (p, i) =>
        if (i < M + 20) p
        else p.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(40L * M + i)))
      }
      val reader = new IndexReader(spark, root)
      val got = Phrase.topKLive(spark, io, s"$root/posindex",
        s"document ${M + 22}", 10, reader).toSeq.map(h => (h.docId, h.score))
      // oracle over the live rows; texts are keyed by url index so the
      // ts rewrite above does not change content
      val want = oraclePhraseOver(live, s"document ${M + 22}", 10)
        .map(h => (h.docId, h.score))
      assert(got == want, "auto-folded posindex diverged")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.compact.segments") = v
        case None => sys.props.remove("graft.compact.segments")
      }
    }
  }

  test("fold refuses a coverage gap; auto-fold failure never fails the sync") {
    // a batch synced while no posindex base existed has no pos delta: the
    // query path refuses crisply. The FOLD must refuse the same gap — a
    // new base stamped at the current version would claim coverage and
    // convert the refusal into silently-missing phrase results forever.
    // And the publish-stage auto-fold is best-effort maintenance: its
    // refusal must not fail (or, repeated, error-budget-halt) the main
    // sync pipeline.
    val prevC = sys.props.get("graft.compact.segments")
    sys.props("graft.compact.segments") = "2"
    try {
      val root = tmpDir("graft-posfoldgap")
      val io = new TableIO(spark, root)
      val M = 120
      def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
      SyncJob.run(spark, io, spark.createDataset(Corpus.localRows(M)), ts(M))
      Positional.build(spark, spark.createDataset(Corpus.localRows(M)),
        s"$root/posindex", io.currentVersion())
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // the gap: base aside, sync a batch (stages no pos delta), restore.
      // New rows are re-stamped past the watermark so each batch picks
      // up exactly its 10 (or 5) fresh docs.
      def grown(upTo: Int, prevUpTo: Int, shift: Long) =
        Corpus.localRows(upTo).zipWithIndex.map { case (pg, i) =>
          if (i < prevUpTo) pg
          else pg.copy(warc_ts = new Timestamp(Corpus.warcTsMillis(shift + i)))
        }
      fs.rename(p(s"$root/posindex"), p(s"$root/posindex.aside"))
      SyncJob.run(spark, io,
        spark.createDataset(grown(M + 10, M, 10L * M)), ts(12L * M))
      fs.rename(p(s"$root/posindex.aside"), p(s"$root/posindex"))
      // a direct fold refuses crisply
      val e = intercept[IllegalStateException] {
        Phrase.foldPosindex(spark, io, s"$root/posindex")
      }
      assert(e.getMessage.contains("refusing to fold"))
      // accumulate deltas past the threshold so publish auto-folds; the
      // fold keeps refusing (the gap batch has no delta) but each sync
      // must still publish and burn no error budget
      (1 to 3).foreach { r =>
        val res = SyncJob.run(spark, io,
          spark.createDataset(
            grown(M + 10 + 5 * r, M + 10 + 5 * (r - 1), 20L * M * r)),
          ts(20L * M * r + 2 * M))
        assert(res.deltaRows == 5, s"sync $r failed under auto-fold refusal")
        assert(Metrics.errorCount(spark, io, res.batchId, SyncJob.Process) == 0,
          s"auto-fold refusal burned error budget on sync $r")
      }
      // the gap is still visible to queries (crisp refusal, not silence)
      val reader = new IndexReader(spark, root)
      val qe = intercept[IllegalStateException] {
        Phrase.topKLive(spark, io, s"$root/posindex", "document 3", 5, reader)
      }
      assert(qe.getMessage.contains("does not cover"))
    } finally {
      prevC match {
        case Some(v) => sys.props("graft.compact.segments") = v
        case None => sys.props.remove("graft.compact.segments")
      }
    }
  }

  test("crashed fold: lingering subsumed deltas are swept by the next fold") {
    // a crash between a fold's base swap and its delta deletes leaves
    // delta dirs stamped <= the new base. sources() hides them (no
    // double count — the stale-reader test), but the sweep must work
    // from the RAW listing: if the next fold deleted only what it
    // enumerates, the leaked dirs would sit at the auto-fold threshold
    // forever and every publish would pay a full fold.
    val root = tmpDir("graft-posfoldcrash")
    val io = new TableIO(spark, root)
    val M = 150
    def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
    SyncJob.run(spark, io, spark.createDataset(Corpus.localRows(M)), ts(M))
    Positional.build(spark, spark.createDataset(Corpus.localRows(M)),
      s"$root/posindex", io.currentVersion())
    val base = Positional.builtFrom(spark, s"$root/posindex/base").get
    // simulate the crash artifact: a delta stamped BELOW the base stamp
    // (subsumed by definition; content is irrelevant to the sweep — use
    // a copy of the base's parquet so the dir is a plausible delta)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = s"$root/posindex/delta/1970-01-01-T-00-00-00-000Z"
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$root/posindex/base"),
      fs, new org.apache.hadoop.fs.Path(stale), false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stale/_built_from"), false)
    assert(io.listDirNames(s"$root/posindex/delta").nonEmpty)
    // queries ignore the leaked dir (stamp <= base): answers stay exact
    val reader = new IndexReader(spark, root)
    val got = Phrase.topKLive(spark, io, s"$root/posindex",
      "document 3", 10, reader).toSeq.map(h => (h.docId, h.score))
    val want = oraclePhraseOver(Corpus.localRows(M), "document 3", 10)
      .map(h => (h.docId, h.score))
    assert(got == want, "leaked subsumed delta changed phrase answers")
    // the next fold sweeps it even though sources() never enumerates it
    Phrase.foldPosindex(spark, io, s"$root/posindex")
    assert(io.listDirNames(s"$root/posindex/delta").isEmpty,
      "subsumed delta dir survived the fold sweep")
    assert(Positional.builtFrom(spark, s"$root/posindex/base").get >= base)
    val got2 = Phrase.topKLive(spark, io, s"$root/posindex",
      "document 3", 10, new IndexReader(spark, root))
      .toSeq.map(h => (h.docId, h.score))
    assert(got2 == want, "fold sweep changed phrase answers")
  }

  test("crash between the fold's two renames: the next fold heals the swap") {
    // the swap window (base moved to base.trash, base.next not yet
    // renamed in) must not persist as "no base": the next fold under the
    // lock rolls FORWARD when a complete base.next exists (its
    // _built_from marker is the last file written before the swap
    // starts) and rolls BACK from base.trash otherwise.
    val root = tmpDir("graft-posswap")
    val io = new TableIO(spark, root)
    val M = 120
    def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
    SyncJob.run(spark, io, spark.createDataset(Corpus.localRows(M)), ts(M))
    Positional.build(spark, spark.createDataset(Corpus.localRows(M)),
      s"$root/posindex", io.currentVersion())
    val want = oraclePhraseOver(Corpus.localRows(M), "document 3", 10)
      .map(h => (h.docId, h.score))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def phrase() = Phrase.topKLive(spark, io, s"$root/posindex",
      "document 3", 10, new IndexReader(spark, root))
      .toSeq.map(h => (h.docId, h.score))
    // roll-forward: crash left the NEW base complete in base.next
    fs.rename(p(s"$root/posindex/base"), p(s"$root/posindex/base.next"))
    Phrase.foldPosindex(spark, io, s"$root/posindex")
    assert(fs.exists(p(s"$root/posindex/base")), "roll-forward lost base")
    assert(!fs.exists(p(s"$root/posindex/base.next")))
    assert(phrase() == want, "roll-forward changed phrase answers")
    // roll-back: crash left only the OLD base, parked in base.trash
    // (base.next incomplete — no _built_from)
    fs.rename(p(s"$root/posindex/base"), p(s"$root/posindex/base.trash"))
    fs.mkdirs(p(s"$root/posindex/base.next"))
    Phrase.foldPosindex(spark, io, s"$root/posindex")
    assert(fs.exists(p(s"$root/posindex/base")), "roll-back lost base")
    assert(!fs.exists(p(s"$root/posindex/base.trash")))
    assert(phrase() == want, "roll-back changed phrase answers")
  }

  test("crashed swap heals on the NEXT SYNC, and interim batches keep " +
      "staging pos deltas (no permanent coverage gap)") {
    // the automatic path: a fold swap crashed between its two renames
    // (base parked in base.trash, no base). The next ordinary sync batch
    // must (a) still stage its positional delta — a batch synced while
    // base is missing would otherwise become a coverage gap the healed
    // base can never close — and (b) heal the swap during publish, so
    // phrase queries recover with NO operator action and NO full
    // index-pos rebuild.
    val root = tmpDir("graft-posautoheal")
    val io = new TableIO(spark, root)
    val M = 120
    def ts(i: Long) = new Timestamp(Corpus.warcTsMillis(i))
    SyncJob.run(spark, io, spark.createDataset(Corpus.localRows(M)), ts(M))
    Positional.build(spark, spark.createDataset(Corpus.localRows(M)),
      s"$root/posindex", io.currentVersion())
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // simulate the crash window: old base parked aside, nothing swapped in
    fs.rename(p(s"$root/posindex/base"), p(s"$root/posindex/base.trash"))
    // an ordinary incremental sync while the posindex is baseless
    val all = Corpus.localRows(M + 30)
    SyncJob.run(spark, io, spark.createDataset(all), ts(M + 30))
    assert(fs.exists(p(s"$root/posindex/base")),
      "sync publish did not heal the crashed swap")
    assert(!fs.exists(p(s"$root/posindex/base.trash")))
    val batchId = io.currentVersion().get
    assert(fs.exists(p(s"$root/posindex/delta/$batchId")),
      "interim batch did not stage its positional delta")
    val got = Phrase.topKLive(spark, io, s"$root/posindex",
      "document 3", 10, new IndexReader(spark, root))
      .toSeq.map(h => (h.docId, h.score))
    val want = oraclePhraseOver(all, "document 3", 10)
      .map(h => (h.docId, h.score))
    assert(got == want, "healed posindex gave wrong phrase answers")
  }
}
