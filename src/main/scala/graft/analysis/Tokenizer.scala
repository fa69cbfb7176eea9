package graft.analysis

/** Tokenizer (FIXTURES.md §4): lowercase (Locale.ROOT), tokens = maximal
  * runs of [a-z0-9]; no stemming, no stopword removal — stopwords stay
  * indexed (that is the skew under test). doclen = token count.
  *
  * Reference analog: openresync delegates analysis to Solr; this is our
  * own fixed analyzer so scores are reproducible bit-for-bit.
  */
object Tokenizer {

  def tokenize(text: String): Array[String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    var start = -1
    while (i <= n) {
      val alnum = i < n && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { out += s.substring(start, i); start = -1 }
      i += 1
    }
    out.toArray
  }

  /** Term frequencies of one document, plus its token count. */
  def termFreqs(text: String): (Map[String, Int], Int) = {
    val toks = tokenize(text)
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    toks.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
    (m.toMap, toks.length)
  }
}
