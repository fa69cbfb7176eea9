package graft.query

import graft.index.{PosPosting, Positional}

/** Randomized equivalence gate for the demultiplexed streaming phrase
  * intersection: for seeded random posting sets (mixed densities — the
  * shapes that drive the demux through block skips, pending drops, and
  * exhaustion drains), `matchesInBucketStreaming` must produce exactly
  * the matches a brute-force position intersection computes, for every
  * lead choice (lead is a heuristic, never a correctness input).
  */
class StreamIntersectSpec extends graft.SparkTestBase {

  /** Deterministic pseudo-random in [0, m) from (seed, i). */
  private def rnd(seed: Long, i: Long, m: Int): Int =
    java.lang.Math.floorMod(graft.corpus.Corpus.mix(seed * 1000003L + i), m.toLong).toInt

  /** One synthetic bucket: per-term doc sets of very different densities
    * (dense ~70%, medium ~25%, sparse ~2% — multi-block vs sub-block),
    * with positions that make some docs phrase-match.
    */
  private def corpus(seed: Long, nDocs: Int,
                     terms: Seq[(String, Int)]): Map[String, Seq[(Long, Seq[Int])]] =
    terms.map { case (t, pct) =>
      t -> (0 until nDocs).flatMap { d =>
        if (rnd(seed + t.hashCode, d.toLong, 100) < pct) {
          val n = 1 + rnd(seed, d.toLong * 31 + t.hashCode, 3)
          val ps = (0 until n)
            .map(k => rnd(seed + 7, d.toLong * 131 + k, 40)).distinct.sorted
          Some((d.toLong, ps))
        } else None
      }
    }.toMap

  private def brute(byTerm: Map[String, Seq[(Long, Seq[Int])]],
                    phrase: Seq[String]): Seq[(Long, Int)] = {
    val maps = phrase.map(t => byTerm(t).map(p => p._1 -> p._2.toSet).toMap)
    val docs = maps.map(_.keySet).reduce(_ intersect _)
    docs.toSeq.sorted.flatMap { d =>
      val tf = maps.head(d).count(p =>
        phrase.indices.forall(i => maps(i)(d).contains(p + i)))
      if (tf > 0) Some((d, tf)) else None
    }
  }

  private def streaming(byTerm: Map[String, Seq[(Long, Seq[Int])]],
                        phrase: Seq[String], lead: String): Seq[(Long, Int)] = {
    import spark.implicits._
    val postings = byTerm.toSeq.flatMap { case (t, ds) =>
      ds.map { case (d, ps) => PosPosting(t, 0, d, 10, ps) }
    }
    val blocks = Positional.buildBlocks(spark.createDataset(postings), 1)
      .collect()
      .sortBy(b => (b.firstDocId, b.term, b.blockId))
    Phrase.matchesInBucketStreaming(blocks.iterator, phrase, lead)
      .map(m => (m.docId, m.phraseTf)).toSeq.sortBy(_._1)
  }

  test("streaming intersection == brute force, all lead choices, seeds") {
    val terms = Seq("dense" -> 70, "mid" -> 25, "sparse" -> 2)
    for (seed <- 1L to 5L) {
      val c = corpus(seed, 900, terms) // dense ≈ 630 docs ≈ 5 blocks
      for (phrase <- Seq(
          Seq("dense", "mid"), Seq("mid", "dense"),
          Seq("dense", "sparse"), Seq("sparse", "dense", "mid"),
          Seq("dense", "dense"), // duplicate slot shares a cursor
          Seq("dense", "mid", "sparse"))) {
        val want = brute(c, phrase)
        for (lead <- phrase.distinct) {
          val got = streaming(c, phrase, lead)
          assert(got == want,
            s"seed=$seed phrase=$phrase lead=$lead: $got != $want")
        }
      }
      assert(brute(c, Seq("dense", "mid")).nonEmpty, s"seed=$seed degenerate")
    }
  }

  test("a term absent from the bucket yields no matches and no leak") {
    val c = corpus(9L, 400, Seq("dense" -> 70, "mid" -> 25))
    Phrase.resetResidentTracking()
    assert(streaming(c, Seq("dense", "ghost", "mid"), "ghost").isEmpty)
    assert(streaming(c, Seq("dense", "ghost", "mid"), "dense").isEmpty)
    assert(Phrase.residentPositionsNow == 0L, "absent-term path leaked positions")
  }
}
