package graft

import graft.corpus.Corpus
import graft.index.{DocIds, Positional}
import graft.query.{Bm25, Phrase}

/** Positional index + phrase query vs a naive in-memory phrase oracle. */
class PhraseSpec extends SparkTestBase {

  val N = 600
  lazy val posDir: String = {
    val d = tmpDir("graft-posidx") + "/pos"
    Positional.build(spark, Corpus.pages(spark, N, 4), d)
    d
  }

  /** Naive oracle: scan every doc's token array for the phrase. */
  private def oraclePhrase(phrase: String, k: Int): Seq[Hit] = {
    val terms = graft.analysis.Tokenizer.tokenize(phrase).toSeq
    val docs = Corpus.localRows(N).map { p =>
      (DocIds.docId(p.url), graft.analysis.Tokenizer.tokenize(p.text))
    }
    val n = N.toLong
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
}
