package graft.query

import graft.corpus.Corpus

/** The fixed reference query set (FIXTURES.md §5) — the rank-identity gate
  * runs every one of these against the naive oracle. q11–q20 are drawn
  * from the corpus vocabulary by the same splitmix procedure as the corpus
  * itself (this code is the spec).
  */
object QuerySet {

  val fixed: Seq[(String, String)] = Seq(
    "q01" -> "rare07",
    "q02" -> "the",
    "q03" -> "the of and",
    "q04" -> "w0003",
    "q05" -> "w2500",
    "q06" -> "the rare13",
    "q07" -> "w0010 w0999 w3777",
    "q08" -> "zzzznotaword",
    "q09" -> "rare21 zzzznotaword",
    "q10" -> "document")

  private def unit(x: Long): Double =
    (Corpus.mix(x) >>> 11).toDouble / (1L << 53).toDouble

  def extra(j: Int): String = {
    val nTerms =
      2 + java.lang.Math.floorMod(Corpus.mix(1011L + j), 3L).toInt
    val terms = (0 until nTerms).map { t =>
      val key = (1011L + j) * 97L + t
      val u = unit(key)
      if (u < 0.2)
        Corpus.stopwords(
          java.lang.Math.floorMod(Corpus.mix(key * 3 + 1),
            Corpus.stopwords.length.toLong).toInt)
      else if (u < 0.9)
        Corpus.contentWord(
          java.lang.Math.floorMod(Corpus.mix(key * 3 + 2),
            Corpus.numContentWords.toLong).toInt)
      else
        Corpus.rareMarker(
          java.lang.Math.floorMod(Corpus.mix(key * 3 + 3),
            Corpus.numRareMarkers.toLong).toInt)
    }
    terms.mkString(" ")
  }

  val all: Seq[(String, String)] =
    fixed ++ (11 to 20).map(j => f"q$j%02d" -> extra(j))
}
