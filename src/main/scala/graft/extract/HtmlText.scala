package graft.extract

import java.nio.charset.StandardCharsets

/** HTML → text extractor (FIXTURES.md §3) — the per-row byte-identical
  * invariant target: `extract(page.html) == page.text` exactly.
  *
  * Reference analog: openresync's per-record destination transform +
  * projection (`transform` + `_.pick`, lib/sync/dataAdapters/solr/solr.js:99-102)
  * — the destination record must equal the transformed source record. Here
  * the "transform" is text extraction and the invariant is byte equality.
  *
  * Closed-form scanner (no HTML lib): drop <head>…</head>, collect inner
  * text of each non-nested <p>…</p> region in order, strip remaining tags,
  * decode &lt; &gt; &amp; (amp last), join regions with "\n".
  */
object HtmlText {

  def extract(html: Array[Byte]): String =
    extractStr(new String(html, StandardCharsets.UTF_8))

  def extractStr(html0: String): String = {
    // 1. drop <head … </head> (first occurrence, case-sensitive)
    val html = {
      val h0 = html0.indexOf("<head")
      if (h0 >= 0) {
        val h1 = html0.indexOf("</head>", h0)
        if (h1 >= 0) html0.substring(0, h0) + html0.substring(h1 + "</head>".length)
        else html0.substring(0, h0)
      } else html0
    }
    // 2. collect <p>…</p> regions in document order
    val regions = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos >= 0 && pos < html.length) {
      val open = html.indexOf("<p>", pos)
      if (open < 0) pos = -1
      else {
        val close = html.indexOf("</p>", open + 3)
        if (close < 0) pos = -1
        else {
          regions += html.substring(open + 3, close)
          pos = close + 4
        }
      }
    }
    // 3. strip any remaining tags, 4. decode entities (amp last)
    val out = regions.map { r =>
      val noTags = stripTags(r)
      noTags
        .replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&amp;", "&")
    }
    out.mkString("\n")
  }

  private def stripTags(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }
}
