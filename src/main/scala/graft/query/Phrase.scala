package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Hit
import graft.index.{PosBlock, Positional}

/** Exact phrase top-k over a positional index (SURVEY §7.7; Solr-surface
  * analog: `q="exact phrase"`).
  *
  * Semantics: a document matches iff the phrase's tokens occur at
  * consecutive positions; phrase tf = number of occurrences. Scoring =
  * BM25 with the phrase treated as one synthetic term: df = #matching
  * docs, tf = phrase tf — computed over the candidate set, deterministic
  * (score desc, docId asc).
  *
  * Plan: per (bucket) group, intersect the phrase terms' position lists
  * doc-at-a-time (positions of term i must contain p+i), emitting
  * (docId, dl, phraseTf); a global agg supplies df; scores are exact.
  */
object Phrase {

  case class PhraseMatch(docId: Long, dl: Int, phraseTf: Int)

  /** Position-list intersection for one doc: count of p where term i has
    * position p+i for all i.
    */
  private[query] def phraseCount(positions: Array[Array[Int]]): Int = {
    if (positions.exists(_.isEmpty)) return 0
    var count = 0
    val first = positions(0)
    var i = 0
    while (i < first.length) {
      val p = first(i)
      var ok = true
      var t = 1
      while (ok && t < positions.length) {
        // positions are sorted: binary search for p+t
        ok = java.util.Arrays.binarySearch(positions(t), p + t) >= 0
        t += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  /** All phrase matches in one bucket's blocks (terms in phrase order). */
  private[query] def matchesInBucket(
      termBlocks: Seq[(String, Array[PosBlock])],
      phraseTerms: Seq[String]): Iterator[PhraseMatch] = {
    val byTerm = termBlocks.toMap
    if (phraseTerms.exists(t => !byTerm.contains(t))) return Iterator.empty
    // decode per-term: docId -> (dl, positions)
    val decoded: Seq[Map[Long, (Int, Array[Int])]] = phraseTerms.map { t =>
      byTerm(t).flatMap(Positional.decodeBlock)
        .map(d => d._1 -> ((d._2, d._3))).toMap
    }
    // candidates = docs containing the rarest term, probed against the rest
    val seed = decoded.minBy(_.size)
    seed.keysIterator.flatMap { docId =>
      if (decoded.forall(_.contains(docId))) {
        val posArrays = decoded.map(_(docId)._2).toArray
        // positions must be aligned to phrase offsets: shift handled in
        // phraseCount via p+i lookups
        val tf = phraseCount(posArrays)
        if (tf > 0) {
          val dl = seed(docId)._1
          Some(PhraseMatch(docId, dl, tf))
        } else None
      } else None
    }
  }

  /** Exact phrase top-k against a positional index parquet dir.
    *
    * Fully distributed — a frequent phrase ("of the") may match an
    * unbounded share of the corpus, so matches are never collected:
    * pass 1 counts them (df for the phrase-as-term idf), pass 2 runs a
    * bounded top-k heap per docId bucket over the persisted match set,
    * and only numBuckets·k candidates reach the driver for the final
    * (score desc, docId asc) head.
    */
  def topK(spark: SparkSession, posIndexDir: String, phrase: String, k: Int,
           n: Long, avgdl: Double): Array[Hit] = {
    import spark.implicits._
    val terms = graft.analysis.Tokenizer.tokenize(phrase).toSeq
    if (terms.isEmpty || k <= 0) return Array.empty
    val blocks = spark.read.parquet(posIndexDir).as[PosBlock]
      .filter($"term".isin(terms.distinct: _*))
    val matches = blocks
      .groupByKey(_.bucket)
      .flatMapGroups { (_, bs) =>
        val byTerm = bs.toArray.groupBy(_.term).toSeq
        matchesInBucket(byTerm, terms)
      }
      .persist()
    try {
      val df = matches.count() // distributed — the phrase's global df
      if (df == 0) return Array.empty
      val idf = Bm25.idf(n, df)
      val candidates = matches
        .groupByKey(m => graft.index.DocIds.bucket(m.docId))
        .flatMapGroups { (_, ms) =>
          val topk = new Wand.TopK(k)
          // ascending docId feed keeps the deterministic tie discipline
          ms.toArray.sortBy(_.docId).foreach(m =>
            topk.insert(m.docId, Bm25.termScore(idf, m.phraseTf, m.dl, avgdl)))
          topk.result().iterator
        }
        .collect()
      candidates
        .sortBy(h => (-h.score, h.docId))
        .take(k)
    } finally matches.unpersist()
  }
}
