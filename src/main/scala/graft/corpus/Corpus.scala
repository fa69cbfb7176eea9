package graft.corpus

import java.sql.Timestamp
import graft.PageRow

/** Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §2).
  *
  * Every field is a pure function of the row index `i` via the splitmix64
  * finalizer — no shared Random state, so generation is identical across
  * partition counts and re-runs (the property all determinism tests lean on).
  *
  * The vocabulary deliberately includes Zipf-weighted stopwords so posting
  * lists are skewed (the north rule's "stopword-heavy postings" case) and
  * 64 rare markers with known tiny posting lists for WAND tests.
  */
object Corpus {

  /** splitmix64 finalizer (public-domain PRNG mix). */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Non-negative remainder of mix(x) modulo m. */
  private def mixMod(x: Long, m: Int): Int =
    java.lang.Math.floorMod(mix(x), m.toLong).toInt

  val stopwords: Array[String] = Array(
    "the", "of", "and", "to", "a", "in", "is", "it", "you", "that", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "at", "be",
    "this", "have", "from")

  val numContentWords = 4000
  def contentWord(r: Int): String = f"w$r%04d"

  val numRareMarkers = 64
  def rareMarker(j: Int): String = f"rare$j%02d"

  // Zipf(s) cumulative weights for rank-weighted draws, precomputed.
  private def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(r => 1.0 / math.pow(r + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }
  private val stopCdf = zipfCdf(stopwords.length, 1.0)
  private val contentCdf = zipfCdf(numContentWords, 1.2)

  private def drawRank(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    val r = if (i >= 0) i else -i - 1
    math.min(r, cdf.length - 1)
  }

  /** Uniform double in [0,1) from mix(x). */
  private def unit(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  def url(i: Long): String = s"https://site${i % 97}.example.test/doc/$i"

  private val epoch2024 = 1704067200000L // 2024-01-01T00:00:00Z

  def warcTsMillis(i: Long): Long = epoch2024 + i * 1000L + mixMod(i, 1000)
  def warcTs(i: Long): Timestamp = new Timestamp(warcTsMillis(i))

  def lang(i: Long): String =
    if (i % 41 == 0) "de" else if (i % 43 == 0) "fr" else "en"

  /** One body token, by successive splitmix draws off stream key `x`. */
  private def token(x: Long): String = {
    if (unit(x) < 0.40) stopwords(drawRank(stopCdf, unit(x * 2 + 1)))
    else contentWord(drawRank(contentCdf, unit(x * 2 + 2)))
  }

  /** Ground-truth extracted text of doc i (title line + sentence lines). */
  def text(i: Long): String = {
    val sb = new StringBuilder
    sb.append("Document ").append(i)
    val nSent = 5 + mixMod(i, 20)
    var s = 0
    while (s < nSent) {
      sb.append('\n')
      val nTok = 4 + mixMod(i * 31 + s, 9)
      var t = 0
      while (t < nTok) {
        if (t > 0) sb.append(' ')
        sb.append(token(mix(i) * 1000003L + s * 131L + t))
        t += 1
      }
      s += 1
    }
    // rare markers: rare(j) appears only where mix(i*64+j) % 1009 == 0
    var j = 0
    while (j < numRareMarkers) {
      if (java.lang.Math.floorMod(mix(i * 64 + j), 1009L) == 0L)
        sb.append('\n').append(rareMarker(j))
      j += 1
    }
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Raw page bytes: html(i) renders text(i) so extract(html(i)) == text(i)
    * exactly — making the byte-identical extraction invariant testable
    * without network data (SURVEY §7.6.2).
    */
  def html(i: Long): Array[Byte] = {
    val lines = text(i).split("\n", -1)
    val sb = new StringBuilder
    sb.append("<html><head><title>doc ").append(i)
      .append("</title><meta charset=\"utf-8\"></head><body>")
    lines.foreach(l => sb.append("<p>").append(escape(l)).append("</p>"))
    sb.append("</body></html>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def row(i: Long): PageRow = PageRow(url(i), warcTs(i), html(i), text(i), lang(i))

  /** The full corpus [0, n) as a local sequence (tests / oracle). */
  def localRows(n: Int): IndexedSeq[PageRow] = (0 until n).map(i => row(i.toLong))

  /** The corpus as a distributed Dataset — generated on executors from row
    * indices, so an arbitrarily large corpus never materializes on the
    * driver (scale path: `spark.range(n)` is planned, partitioned, and
    * whole-stage-codegen'd like any other source).
    */
  def pages(spark: org.apache.spark.sql.SparkSession, n: Long,
            partitions: Int = 0): org.apache.spark.sql.Dataset[PageRow] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(i => row(i))
  }

  /** The corpus slice [lo, hi) — the incremental-source analog: warc_ts
    * is strictly monotone in i, so a crawl window maps to an index
    * range. Mirrors the reference's server-side-filtered download (the
    * `$filter` endpoint returns only the watermark window, never the
    * whole corpus) and a parquet source's partition pruning; the engine
    * still applies its own watermark predicate on top.
    */
  def pagesRange(spark: org.apache.spark.sql.SparkSession, lo: Long, hi: Long,
                 partitions: Int = 0): org.apache.spark.sql.Dataset[PageRow] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(lo, hi, 1, partitions)
      else spark.range(lo, hi)
    base.map(i => row(i))
  }
}
