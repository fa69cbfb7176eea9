package graft.query

/** BM25 scoring math — shared verbatim by the engine (Wand) and the
  * test oracle (NaiveIndex) so scores agree bit-for-bit.
  *
  * Lucene-style BM25 (public: Robertson & Zaragoza 2009; Lucene
  * BM25Similarity): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  * tfNorm = tf / (tf + k1 * (1 - b + b * dl/avgdl)), k1 = 1.2, b = 0.75.
  *
  * Determinism contract (SURVEY §7.6.1): a document's score is the sum of
  * per-term scores **in lexicographically ascending term order**, computed
  * in Double — float addition order never depends on parallelism, so
  * scores are identical at any partition count.
  */
object Bm25 extends Serializable {
  val K1 = 1.2
  val B = 0.75

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Int, dl: Int, avgdl: Double): Double =
    tf / (tf + K1 * (1.0 - B + B * dl / avgdl))

  def termScore(idf: Double, tf: Int, dl: Int, avgdl: Double): Double =
    idf * tfNorm(tf, dl, avgdl)

  /** Valid upper bound of termScore over a posting block: tfNorm is
    * increasing in tf and decreasing in dl, so (maxTf, minDl) dominates.
    * Computed with the *query-time* avgdl, so it never goes stale as the
    * index grows incrementally.
    */
  def blockUpperBound(idf: Double, maxTf: Int, minDl: Int, avgdl: Double): Double =
    idf * tfNorm(maxTf, minDl, avgdl)

  /** Normalize a raw query string into the engine's canonical term list:
    * tokenize, dedupe, sort lexicographically (the fixed summation order).
    */
  def queryTerms(q: String): Array[String] =
    graft.analysis.Tokenizer.tokenize(q).distinct.sorted
}
