package graft.oracle

import graft.{Hit, PageRow}
import graft.analysis.Tokenizer
import graft.extract.HtmlText
import graft.index.DocIds
import graft.query.Bm25

/** Single-threaded naive reference implementation (FIXTURES.md §6) —
  * tokenize → count → BM25 in plain Scala collections. Plays the role of
  * openresync's "destination matches MLS" dashboard check
  * (src/components/StatsDetails.vue:26-45): an independent answer the
  * engine must match rank- and score-identically.
  */
class NaiveIndex(pages: Seq[PageRow]) {

  case class NDoc(docId: Long, url: String, dl: Int, tfs: Map[String, Int])

  val docs: Vector[NDoc] = pages.iterator.map { p =>
    val text = HtmlText.extract(p.html)
    val (tfs, dl) = Tokenizer.termFreqs(text)
    NDoc(DocIds.docId(p.url), p.url, dl, tfs)
  }.toVector

  val n: Long = docs.size.toLong
  val avgdl: Double =
    if (n == 0) 0.0 else docs.iterator.map(_.dl.toLong).sum.toDouble / n

  /** term → docId-ascending postings (docId, tf, dl). */
  val postings: Map[String, Vector[(Long, Int, Int)]] = {
    val m = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int, Int)]]
    docs.sortBy(_.docId).foreach { d =>
      d.tfs.foreach { case (t, tf) =>
        m.getOrElseUpdate(t,
          scala.collection.mutable.ArrayBuffer.empty) += ((d.docId, tf, d.dl))
      }
    }
    m.view.mapValues(_.toVector).toMap
  }

  def df(term: String): Long = postings.get(term).map(_.size.toLong).getOrElse(0L)
  def cf(term: String): Long =
    postings.get(term).map(_.iterator.map(_._2.toLong).sum).getOrElse(0L)

  /** Exact top-k: per-doc score = Σ over lexicographically sorted query
    * terms (the engine's fixed summation order) of Bm25.termScore; sort
    * (score desc, docId asc); take k.
    */
  def topK(q: String, k: Int): Array[Hit] = {
    val terms = Bm25.queryTerms(q).filter(postings.contains)
    if (terms.isEmpty) return Array.empty
    val idf = terms.map(t => t -> Bm25.idf(n, df(t))).toMap
    val byDoc = terms.map(t => t -> postings(t).map(p => p._1 -> ((p._2, p._3))).toMap)
    // doc-major summation in lex term order: walk docs, then terms in order
    val candidates = terms.flatMap(t => postings(t).map(_._1)).distinct.sorted
    val scores = candidates.map { d =>
      var s = 0.0
      byDoc.foreach { case (t, m) =>
        m.get(d).foreach { case (tf, dl) =>
          s += Bm25.termScore(idf(t), tf, dl, avgdl)
        }
      }
      d -> s
    }
    scores.toArray
      .sortBy { case (d, s) => (-s, d) }
      .take(k)
      .map { case (d, s) => Hit(d, s) }
  }

  def urlOf(docId: Long): String = docs.find(_.docId == docId).get.url
}
