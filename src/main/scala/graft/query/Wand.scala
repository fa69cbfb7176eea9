package graft.query

import graft.{Hit, IndexBlock}
import graft.index.Codec

/** Block-max WAND top-k evaluation (north rule "block-max WAND top-k
  * scoring"; public algorithm: Broder et al. 2003 WAND; Ding & Suel 2011
  * block-max refinement).
  *
  * Runs doc-at-a-time **within one docId bucket** — the engine executes
  * one instance per bucket (flatMapGroups over the bucket key), each
  * producing a rank-safe local top-k; the global top-k is the
  * (score desc, docId asc) head of the per-bucket unions.
  *
  * Rank-safety with the deterministic tie-break: candidates arrive in
  * ascending docId order, so an equal-score later doc never evicts an
  * earlier one — the heap admits strictly-greater scores only, and blocks
  * are skipped when their upper bound is ≤ the current threshold.
  *
  * Score determinism: a fully-evaluated doc sums term contributions in
  * lexicographic term order (cursors are created from a sorted term list
  * and scoring walks that fixed array), bit-identical to the naive oracle.
  */
object Wand extends Serializable {

  /** A cursor over one term's posting blocks within a bucket. Blocks are
    * sorted by firstDocId (disjoint ranges) and decoded lazily on entry.
    */
  final class TermCursor(val term: String, val idf: Double,
                         blocks0: Array[IndexBlock], avgdl: Double) {
    private val blocks = blocks0.sortBy(_.firstDocId)
    /** Global upper bound of this term's score in the bucket. */
    val globalUB: Double =
      blocks.map(b => Bm25.blockUpperBound(idf, b.maxTf, b.minDl, avgdl)).max

    private var bi = 0
    private var ids: Array[Long] = _
    private var tfs: Array[Int] = _
    private var dls: Array[Int] = _
    private var pi = 0
    var curDoc: Long = _
    decodeAndPosition()

    private def decodeAndPosition(): Unit = {
      if (bi >= blocks.length) { curDoc = Long.MaxValue; ids = null }
      else {
        val b = blocks(bi)
        ids = Codec.decodeDocIds(b.docIdsVB, b.count, b.firstDocId)
        tfs = Codec.decodeInts(b.tfsVB, b.count)
        dls = Codec.decodeInts(b.dlsVB, b.count)
        pi = 0
        curDoc = ids(0)
      }
    }

    def exhausted: Boolean = curDoc == Long.MaxValue

    /** Upper bound of the current block (block-max). */
    def currentBlockUB: Double = {
      val b = blocks(bi)
      Bm25.blockUpperBound(idf, b.maxTf, b.minDl, avgdl)
    }

    /** Last docId of the current block (block-max skip boundary). */
    def currentBlockLast: Long = blocks(bi).lastDocId

    /** Advance to the first posting with docId >= target. */
    def seek(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      // skip whole blocks without decoding
      if (blocks(bi).lastDocId < target) {
        while (bi < blocks.length && blocks(bi).lastDocId < target) bi += 1
        decodeAndPosition()
        if (exhausted) return
      }
      // position within the block
      while (pi < ids.length && ids(pi) < target) pi += 1
      if (pi >= ids.length) { bi += 1; decodeAndPosition(); seek(target) }
      else curDoc = ids(pi)
    }

    def next(): Unit = seek(if (curDoc == Long.MaxValue) curDoc else curDoc + 1)

    /** Score contribution at curDoc (call only when positioned on it). */
    def score(): Double = Bm25.termScore(idf, tfs(pi), dls(pi), avgdl)
  }

  /** Bounded top-k heap with the deterministic (score desc, docId asc)
    * order. `insert` admits strictly-greater scores only — callers feed
    * docIds in ascending order, so ties keep the earlier docId.
    */
  final class TopK(k: Int) {
    private val heap = new java.util.PriorityQueue[Hit](
      math.max(k, 1),
      (a: Hit, b: Hit) =>
        if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
        else java.lang.Long.compare(b.docId, a.docId)) // larger docId = worse

    def threshold: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.peek().score

    def insert(docId: Long, score: Double): Unit = {
      if (heap.size < k) heap.add(Hit(docId, score))
      else if (score > heap.peek().score ||
               (score == heap.peek().score && docId < heap.peek().docId)) {
        heap.poll(); heap.add(Hit(docId, score))
      }
    }

    def result(): Array[Hit] = {
      val out = new Array[Hit](heap.size)
      var i = out.length - 1
      while (i >= 0) { out(i) = heap.poll(); i -= 1 }
      out // (score desc, docId asc)
    }
  }

  /** Exact top-k over one bucket's blocks for the query terms.
    *
    * @param termBlocks (term, blocks-in-this-bucket), terms lexicographically
    *                   sorted (the fixed score-summation order)
    * @param idf        per query term (from the dict, global df)
    */
  def topKInBucket(
      termBlocks: Seq[(String, Array[IndexBlock])],
      idf: Map[String, Double],
      avgdl: Double,
      k: Int): Array[Hit] = {
    // lex-sorted cursor array = fixed scoring order
    val lex: Array[TermCursor] = termBlocks
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
      .map { case (t, bs) => new TermCursor(t, idf(t), bs, avgdl) }
      .toArray
    if (lex.isEmpty || k <= 0) return Array.empty

    val topk = new TopK(k)
    // byDoc: cursor order for pivoting, re-sorted each round (q terms are few)
    val byDoc = lex.clone()

    var done = false
    while (!done) {
      java.util.Arrays.sort(byDoc, (a: TermCursor, b: TermCursor) =>
        java.lang.Long.compare(a.curDoc, b.curDoc))
      if (byDoc(0).exhausted) done = true
      else {
        val theta = topk.threshold
        // pivot: least p with Σ_{i<=p} globalUB > theta
        var acc = 0.0
        var p = -1
        var i = 0
        while (p < 0 && i < byDoc.length) {
          if (!byDoc(i).exhausted) {
            acc += byDoc(i).globalUB
            if (acc > theta) p = i
          }
          i += 1
        }
        if (p < 0) done = true // no doc can beat theta
        else {
          val pivotDoc = byDoc(p).curDoc
          if (pivotDoc == Long.MaxValue) done = true
          else if (byDoc(0).curDoc == pivotDoc) {
            // all cursors [0..p] sit on pivotDoc; block-max check
            var blockSum = 0.0
            var j = 0
            while (j <= p) { blockSum += byDoc(j).currentBlockUB; j += 1 }
            // cursors beyond p also on pivotDoc contribute too
            var j2 = p + 1
            while (j2 < byDoc.length && byDoc(j2).curDoc == pivotDoc) {
              blockSum += byDoc(j2).currentBlockUB; j2 += 1
            }
            if (blockSum <= theta) {
              // safe skip: no doc in [pivotDoc, d2] can beat theta
              var d2 = Long.MaxValue
              var m = 0
              while (m < j2) {
                if (byDoc(m).currentBlockLast < d2) d2 = byDoc(m).currentBlockLast
                m += 1
              }
              if (j2 < byDoc.length && byDoc(j2).curDoc != Long.MaxValue &&
                  byDoc(j2).curDoc - 1 < d2) d2 = byDoc(j2).curDoc - 1
              if (d2 == Long.MaxValue) done = true
              else {
                var m2 = 0
                while (m2 < j2) { byDoc(m2).seek(d2 + 1); m2 += 1 }
              }
            } else {
              // full evaluation in lex order (deterministic summation)
              var s = 0.0
              var li = 0
              while (li < lex.length) {
                if (lex(li).curDoc == pivotDoc) s += lex(li).score()
                li += 1
              }
              topk.insert(pivotDoc, s)
              var m = 0
              while (m < byDoc.length) {
                if (byDoc(m).curDoc == pivotDoc) byDoc(m).next()
                m += 1
              }
            }
          } else {
            // advance the first not-yet-at-pivot cursor to the pivot
            byDoc(0).seek(pivotDoc)
          }
        }
      }
    }
    topk.result()
  }

  /** Exhaustive term-at-a-time evaluation — the distributed-side oracle
    * used by tests to cross-check WAND's pruning, and a fallback scorer.
    * Sums per-doc contributions in lex term order (cursor array is lex
    * sorted and docs accumulate per term sequentially in that order).
    */
  def taatInBucket(
      termBlocks: Seq[(String, Array[IndexBlock])],
      idf: Map[String, Double],
      avgdl: Double,
      k: Int): Array[Hit] = {
    val acc = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    termBlocks.sortBy(_._1).foreach { case (t, bs) =>
      val theIdf = idf(t)
      bs.sortBy(_.firstDocId).foreach { b =>
        val ids = Codec.decodeDocIds(b.docIdsVB, b.count, b.firstDocId)
        val tfs = Codec.decodeInts(b.tfsVB, b.count)
        val dls = Codec.decodeInts(b.dlsVB, b.count)
        var i = 0
        while (i < b.count) {
          val s = Bm25.termScore(theIdf, tfs(i), dls(i), avgdl)
          val prev = acc.get(ids(i))
          acc.put(ids(i), (if (prev == null) 0.0 else prev.doubleValue()) + s)
          i += 1
        }
      }
    }
    val topk = new TopK(k)
    val it = acc.entrySet().iterator() // ascending docId → ties keep earlier
    while (it.hasNext) {
      val e = it.next()
      topk.insert(e.getKey, e.getValue)
    }
    topk.result()
  }
}
