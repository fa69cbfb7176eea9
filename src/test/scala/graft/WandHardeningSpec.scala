package graft

import org.scalacheck.Gen
import graft.PropHelper.forAllSeeded
import graft.corpus.Corpus
import graft.index.{DocIds, SegmentBuilder}
import graft.oracle.NaiveIndex
import graft.query.{Bm25, Wand}

/** WAND pruning hardening: randomized queries and adversarially small
  * blocks, evaluated locally (no Spark) against both TAAT and the naive
  * oracle. A rank-safety bug in the block-max skip logic would show up
  * here long before the fixed 20-query set catches it.
  */
class WandHardeningSpec extends org.scalatest.funsuite.AnyFunSuite {

  val N = 400
  lazy val oracle = new NaiveIndex(Corpus.localRows(N))

  /** Local block build with a given block size (exercises multi-block
    * runs + block-max skipping at size 4).
    */
  private def buildBlocks(blockSize: Int): Map[(String, Int), Array[IndexBlock]] = {
    val postings = oracle.docs.flatMap { d =>
      d.tfs.map { case (t, tf) =>
        Posting(t, DocIds.bucket(d.docId), d.docId, tf, d.dl)
      }
    }
    postings.groupBy(p => (p.term, p.bucket)).map { case (key, ps) =>
      val sorted = ps.sortBy(_.docId).toArray
      val blocks = sorted.grouped(blockSize).zipWithIndex.map {
        case (chunk, bi) =>
          val ids = chunk.map(_.docId)
          IndexBlock(key._1, key._2, bi, ids.head, ids.last, chunk.length,
            chunk.map(_.tf).max, chunk.map(_.dl).min,
            chunk.map(_.tf.toLong).sum,
            graft.index.Codec.encodeDocIds(ids, ids.head),
            graft.index.Codec.encodeInts(chunk.map(_.tf)),
            graft.index.Codec.encodeInts(chunk.map(_.dl)), "b")
      }.toArray
      key -> blocks
    }
  }

  private def engineTopK(blocks: Map[(String, Int), Array[IndexBlock]],
                         q: String, k: Int, wand: Boolean): Seq[Hit] = {
    val terms = Bm25.queryTerms(q).filter(t => oracle.postings.contains(t))
    if (terms.isEmpty) return Seq.empty
    val idf = terms.map(t => t -> Bm25.idf(oracle.n, oracle.df(t))).toMap
    val byBucket = blocks.filter(e => terms.contains(e._1._1))
      .groupBy(_._1._2)
    byBucket.values.toSeq
      .flatMap { g =>
        val byTerm = g.map { case ((t, _), bs) => (t, bs) }.toSeq
        if (wand) Wand.topKInBucket(byTerm, idf, oracle.avgdl, k)
        else Wand.taatInBucket(byTerm, idf, oracle.avgdl, k)
      }
      .sortBy(h => (-h.score, h.docId))
      .take(k)
  }

  private val vocabGen: Gen[String] = Gen.oneOf(
    Gen.oneOf(Corpus.stopwords.toIndexedSeq),
    Gen.choose(0, 400).map(Corpus.contentWord),
    Gen.choose(0, 63).map(Corpus.rareMarker),
    Gen.const("document"),
    Gen.const("nosuchterm"))
  private val queryGen: Gen[(String, Int)] = for {
    nTerms <- Gen.choose(1, 5)
    terms <- Gen.listOfN(nTerms, vocabGen)
    k <- Gen.oneOf(1, 3, 10, 50)
  } yield (terms.mkString(" "), k)

  Seq(4, 128).foreach { blockSize =>
    test(s"random queries: WAND == TAAT == oracle at blockSize=$blockSize") {
      val blocks = buildBlocks(blockSize)
      forAllSeeded(queryGen, n = 150) { case (q, k) =>
        val wand = engineTopK(blocks, q, k, wand = true)
          .map(h => (h.docId, h.score))
        val taat = engineTopK(blocks, q, k, wand = false)
          .map(h => (h.docId, h.score))
        val want = oracle.topK(q, k).map(h => (h.docId, h.score)).toSeq
        assert(wand == want, s"WAND != oracle for [$q] k=$k bs=$blockSize")
        assert(taat == want, s"TAAT != oracle for [$q] k=$k bs=$blockSize")
      }
    }
  }

  /** LSM hardening: docs scattered over 3 segments with stale older
    * copies (perturbed tfs) and purges, killed by tombstones — the
    * MergedTermCursor + dead-skip + block-max interplay must still be
    * rank- and score-identical to a brute force over the LIVE versions.
    */
  test("multi-segment cursors + tombstones: WAND == TAAT == brute force") {
    val rng = new scala.util.Random(11)
    case class DocV(docId: Long, dl: Int, tfs: Map[String, Int])
    val segs = 3
    val plan = oracle.docs.map { d =>
      val main = rng.nextInt(segs)
      val purged = rng.nextDouble() < 0.10
      val staleIn = if (main > 0 && rng.nextDouble() < 0.30)
        Some(rng.nextInt(main)) else None
      (d, main, purged, staleIn)
    }
    val live = plan.filterNot(_._3)
      .map { case (d, _, _, _) => DocV(d.docId, d.dl, d.tfs) }
    val dead: Map[Long, String] = plan.flatMap {
      case (d, _, true, _) => Some(d.docId -> "~")
      case (d, main, _, Some(_)) => Some(d.docId -> s"s$main")
      case _ => None
    }.toMap
    // per-segment posting pools (stale copies get perturbed tf/dl)
    val segDocs: Map[Int, Seq[DocV]] = (0 until segs).map { s =>
      s -> plan.flatMap { case (d, main, _, staleIn) =>
        if (main == s) Some(DocV(d.docId, d.dl, d.tfs))
        else if (staleIn.contains(s))
          Some(DocV(d.docId, d.dl + 7, d.tfs.map { case (t, tf) => t -> (tf + 1) }))
        else None
      }
    }.toMap
    val blocks: Map[(String, Int), Array[IndexBlock]] = {
      val all = for {
        (s, docs) <- segDocs.toSeq
        d <- docs
        (t, tf) <- d.tfs.toSeq
      } yield (s, Posting(t, DocIds.bucket(d.docId), d.docId, tf, d.dl))
      all.groupBy { case (s, p) => (s, p.term, p.bucket) }.toSeq
        .flatMap { case ((s, t, bkt), ps) =>
          ps.map(_._2).sortBy(_.docId).grouped(4).zipWithIndex.map {
            case (chunk0, bi) =>
              val chunk = chunk0.toArray
              val ids = chunk.map(_.docId)
              IndexBlock(t, bkt, bi, ids.head, ids.last, chunk.length,
                chunk.map(_.tf).max, chunk.map(_.dl).min,
                chunk.map(_.tf.toLong).sum,
                graft.index.Codec.encodeDocIds(ids, ids.head),
                graft.index.Codec.encodeInts(chunk.map(_.tf)),
                graft.index.Codec.encodeInts(chunk.map(_.dl)), s"s$s")
          }
        }
        .groupBy(b => (b.term, b.bucket))
        .map { case (k, bs) => k -> bs.toArray }
    }
    val n = live.size.toLong
    val avgdl = live.map(_.dl.toLong).sum.toDouble / n
    def df(t: String): Long = live.count(_.tfs.contains(t)).toLong

    def brute(q: String, k: Int): Seq[(Long, Double)] = {
      val terms = Bm25.queryTerms(q).filter(t => df(t) > 0)
      if (terms.isEmpty) return Seq.empty
      val idf = terms.map(t => t -> Bm25.idf(n, df(t))).toMap
      live.flatMap { d =>
        var s = 0.0
        var hit = false
        terms.foreach { t =>
          d.tfs.get(t).foreach { tf =>
            s += Bm25.termScore(idf(t), tf, d.dl, avgdl); hit = true
          }
        }
        if (hit) Some((d.docId, s)) else None
      }.sortBy { case (id, s) => (-s, id) }.take(k)
    }

    def engine(q: String, k: Int, wand: Boolean): Seq[(Long, Double)] = {
      val terms = Bm25.queryTerms(q).filter(t => df(t) > 0)
      if (terms.isEmpty) return Seq.empty
      val idf = terms.map(t => t -> Bm25.idf(n, df(t))).toMap
      blocks.filter(e => terms.contains(e._1._1)).groupBy(_._1._2)
        .values.toSeq
        .flatMap { g =>
          val byTerm = g.map { case ((t, _), bs) => (t, bs) }.toSeq
          if (wand) Wand.topKInBucket(byTerm, idf, avgdl, k, dead)
          else Wand.taatInBucket(byTerm, idf, avgdl, k, dead)
        }
        .sortBy(h => (-h.score, h.docId)).take(k)
        .map(h => (h.docId, h.score))
    }

    forAllSeeded(queryGen, n = 120) { case (q, k) =>
      val want = brute(q, k)
      assert(engine(q, k, wand = true) == want, s"LSM WAND != brute [$q] k=$k")
      assert(engine(q, k, wand = false) == want, s"LSM TAAT != brute [$q] k=$k")
    }
  }

  test("block-level invariance: blockSize 4 and 128 give identical results") {
    val b4 = buildBlocks(4)
    val b128 = buildBlocks(128)
    graft.query.QuerySet.all.foreach { case (name, q) =>
      val r4 = engineTopK(b4, q, 10, wand = true).map(h => (h.docId, h.score))
      val r128 = engineTopK(b128, q, 10, wand = true).map(h => (h.docId, h.score))
      assert(r4 == r128, s"$name differs across block sizes")
    }
  }
}
