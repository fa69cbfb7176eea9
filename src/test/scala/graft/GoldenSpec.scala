package graft

import java.nio.file.{Files, Paths}
import graft.corpus.Corpus
import graft.oracle.NaiveIndex
import graft.query.QuerySet

/** Golden-file regression gate (FIXTURES.md §5): the oracle's top-10 for
  * every reference query at n=1000, committed once as
  * src/test/resources/golden/q##.tsv (`rank docId url score`), asserted
  * forever. Guards against silent drift in the corpus generator,
  * tokenizer, extractor, or BM25 math — any of which would silently move
  * both engine and oracle together and escape the identity tests.
  *
  * If goldens are absent (first run), they are generated; commit them.
  */
class GoldenSpec extends org.scalatest.funsuite.AnyFunSuite {

  val N = 1000
  val K = 10
  val dir = "src/test/resources/golden"
  lazy val oracle = new NaiveIndex(Corpus.localRows(N))

  private def render(name: String, q: String): String = {
    val hits = oracle.topK(q, K)
    hits.zipWithIndex.map { case (h, i) =>
      // score via Double.toString — exact round-trippable representation
      s"${i + 1}\t${h.docId}\t${oracle.urlOf(h.docId)}\t${h.score}"
    }.mkString("", "\n", "\n")
  }

  test("golden top-10 files match the oracle for all 20 reference queries") {
    Files.createDirectories(Paths.get(dir))
    var generated = 0
    QuerySet.all.foreach { case (name, q) =>
      val path = Paths.get(s"$dir/$name.tsv")
      val current = render(name, q)
      if (!Files.exists(path)) {
        Files.writeString(path, current)
        generated += 1
      } else {
        val golden = Files.readString(path)
        assert(golden == current,
          s"$name diverged from committed golden $path")
      }
    }
    if (generated > 0)
      info(s"generated $generated golden files — commit them")
  }
}
