package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper.forAllSeeded
import graft.corpus.Corpus
import graft.extract.HtmlText
import graft.analysis.Tokenizer

/** Pure (no Spark) tests: corpus determinism + the byte-identical
  * extraction invariant (north rule: "byte-identical extracted text per
  * url"), plus the extractor property over the corpus grammar.
  */
class CorpusExtractSpec extends AnyFunSuite {

  test("corpus generation is deterministic") {
    val a = Corpus.row(123L)
    val b = Corpus.row(123L)
    assert(a.url == b.url && a.text == b.text)
    assert(java.util.Arrays.equals(a.html, b.html))
    assert(a.warc_ts == b.warc_ts)
  }

  test("extraction invariant: extract(html(i)) == text(i) byte-for-byte, n=1000") {
    (0 until 1000).foreach { i =>
      val p = Corpus.row(i.toLong)
      val extracted = HtmlText.extract(p.html)
      assert(extracted == p.text, s"extraction mismatch at doc $i")
      // byte-identity under UTF-8
      assert(java.util.Arrays.equals(
        extracted.getBytes("UTF-8"), p.text.getBytes("UTF-8")))
    }
  }

  test("warc_ts strictly increasing (clean watermark windows)") {
    var prev = Long.MinValue
    (0 until 2000).foreach { i =>
      val t = Corpus.warcTsMillis(i.toLong)
      assert(t > prev, s"warc_ts not increasing at $i")
      prev = t
    }
  }

  test("extractor: entity decode and head-drop per spec") {
    val html = "<html><head><title>x &amp; y</title></head>" +
      "<body><p>a &lt;b&gt; &amp;c</p><p>line<b>2</b></p></body></html>"
    assert(HtmlText.extractStr(html) == "a <b> &c\nline2")
  }

  test("property: extract(render(s)) == s over the corpus text grammar") {
    val lineGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.oneOf(Corpus.stopwords.toIndexedSeq),
      Gen.choose(0, 3999).map(Corpus.contentWord),
      Gen.const("x & y <z>"))).map(_.mkString(" "))
    val textGen = Gen.nonEmptyListOf(lineGen).map(_.mkString("\n"))
    forAllSeeded(textGen) { s =>
      val esc = s.split("\n", -1).map(l =>
        "<p>" + l.replace("&", "&amp;").replace("<", "&lt;")
          .replace(">", "&gt;") + "</p>").mkString
      val html = s"<html><head><title>t</title></head><body>$esc</body></html>"
      assert(HtmlText.extractStr(html) == s)
    }
  }

  test("tokenizer: maximal [a-z0-9] runs, lowercased") {
    assert(Tokenizer.tokenize("Hello, World-42!\nfoo_bar").toSeq ==
      Seq("hello", "world", "42", "foo", "bar"))
    assert(Tokenizer.tokenize("").isEmpty)
    assert(Tokenizer.tokenize("...").isEmpty)
  }

  test("rare markers have small known posting lists") {
    val n = 1000
    val withRare07 = (0 until n).count(i => Corpus.text(i.toLong).contains("rare07"))
    assert(withRare07 >= 0 && withRare07 < 20)
    // at least some rare markers present in a 1000-doc corpus
    val anyRare = (0 until n).exists(i => Corpus.text(i.toLong).contains("rare"))
    assert(anyRare)
  }
}
