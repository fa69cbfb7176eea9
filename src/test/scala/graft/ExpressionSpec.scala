package graft

import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.functions.functions.{cosine_sim, extract_text, term_stats}

/** Custom Catalyst expression tests: eval vs interpreted paths, SQL
  * registry surface, and parity with the pure Scala implementations.
  */
class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("extract_text == HtmlText.extract, inside codegen") {
    val pages = Corpus.pages(spark, 200, 4)
    val bad = pages.toDF()
      .select(col("url"), extract_text(col("html")).as("et"), col("text"))
      .filter(col("et") =!= col("text"))
      .count()
    assert(bad == 0L)
  }

  test("term_stats == Tokenizer.termFreqs") {
    val rows = Corpus.pages(spark, 100, 2).toDF()
      .select(col("url"),
        term_stats(extract_text(col("html"))).as("ts"))
      .select(col("url"), col("ts.tfs"), col("ts.doclen"))
      .as[(String, Map[String, Int], Int)]
      .collect()
    rows.foreach { case (url, tfs, dl) =>
      val i = url.split("/").last.toLong
      val (wantTfs, wantDl) = graft.analysis.Tokenizer.termFreqs(Corpus.text(i))
      assert(dl == wantDl, s"doclen mismatch for $url")
      assert(tfs == wantTfs, s"tfs mismatch for $url")
    }
  }

  test("cosine_sim matches a reference implementation, deterministic") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, 0.5f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val q = Seq(Tuple1(Array(2.0f, 1.0f, 0.5f))).toDF("q")
    val got = vecs.crossJoin(q)
      .select(col("id"), cosine_sim(col("v"), col("q")).as("c"))
      .as[(Long, Double)].collect().toMap
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = Array(2.0f, 1.0f, 0.5f)
    assert(got(1L) == ref(Array(1.0f, 2.0f, 3.0f), qv))
    assert(got(2L) == ref(Array(-1.0f, 0.5f, 0.0f), qv))
    assert(got(3L) == 0.0) // zero vector guard
  }

  test("lsh_bits == the aggregate(zip_with(...)) lambda formulation") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(16)(j => ((Corpus.mix(i * 31 + j) % 100) / 17.0f)))
    }.toDF("id", "v")
    val got = vecs
      .select(col("id"), graft.functions.functions.lsh_bits(col("v")).as("b"))
      .as[(Long, Long)].collect().toMap
    // the SQL-lambda reference (what the DuckDB oracle computes)
    val want = vecs
      .select(col("id"), explode(expr("sequence(0, 7)")).as("j"))
      .join(vecs, Seq("id"))
      .select(col("id"), col("j"),
        expr("aggregate(zip_with(v, sequence(0, size(v)-1), " +
          "(x, i) -> cast(x as double) * (((i*31 + j*17) % 7) - 3)), " +
          "0D, (a, x) -> a + x)").as("dot"))
      .groupBy(col("id"))
      .agg(sum(when(col("dot") > 0,
        pow(lit(2), col("j")).cast("bigint")).otherwise(0L)).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("simhash64 == the 64-way md5-bit explode pipeline, bit-identical") {
    // documents-like texts: lowercase tokens, repeats (tf weighting),
    // double/trailing spaces (split(' ', -1) semantics must agree)
    val docs = ((0L until 60L).map { i =>
      val toks = (0 until (3 + (Corpus.mix(i) % 20).toInt.abs))
        .map(j => Corpus.contentWord(math.floorMod(Corpus.mix(i * 7 + j), 50).toInt))
      (i, toks.mkString(" "))
    } :+ ((60L, "a  b c ")) :+ ((61L, ""))).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        graft.functions.functions.simhash64(col("text")).as("sh"))
      .select(col("doc_id"), col("sh.simhash_hi"), col("sh.simhash_lo"))
      .as[(Long, Long, Long)].collect()
      .map { case (d, h, l) => d -> ((h, l)) }.toMap
    // the explicit column-pipeline reference (what the DuckDB oracle runs)
    val th = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), md5(col("term")).as("h"))
      .agg(count(lit(1)).as("w"))
    val want = th
      .crossJoin(spark.range(1, 65).select(col("id").cast("int").as("b")))
      .select(col("doc_id"), col("b"), col("w"),
        expr("cast(conv(substring(h, (b+3) div 4, 1), 16, 10) as int)").as("v"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(
        expr("cast(floor(v / pow(2, (b-1) % 4)) as int) % 2") === 1, col("w"))
        .otherwise(-col("w"))).as("s"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("s") > 0 && col("b") > 32,
          pow(lit(2), col("b") - 33).cast("bigint")).otherwise(0L)).as("hi"),
        sum(when(col("s") > 0 && col("b") <= 32,
          pow(lit(2), col("b") - 1).cast("bigint")).otherwise(0L)).as("lo"))
      .as[(Long, Long, Long)].collect()
      .map { case (d, h, l) => d -> ((h, l)) }.toMap
    assert(got == want)
  }

  test("minhash_sigs == the per-shingle explode/groupBy pipeline, bit-identical") {
    import graft.functions.MinHashSigsExpr.{P, a, b}
    // edge cases: empty text (md5('') shingle), shorter-than-shingle,
    // exact-shingle, stride boundaries, multibyte chars (substring /
    // length are code-POINT semantics in both engines)
    val docs = ((0L until 60L).map { i =>
      val toks = (0 until (1 + math.floorMod(Corpus.mix(i), 30).toInt))
        .map(j => Corpus.contentWord(math.floorMod(Corpus.mix(i * 11 + j), 80).toInt))
      (i, toks.mkString(" "))
    } :+ ((60L, "")) :+ ((61L, "abc")) :+ ((62L, "abcde")) :+
      ((63L, "abcdefgh")) :+ ((64L, "abcdefghi")) :+
      ((65L, "héllo wörld ünïcode — ascii no more")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.functions.functions.minhash_sigs(col("text")).as("sig"))
      .as[(Long, Seq[Long])].collect()
      .map { case (d, s) => d -> s.toVector }.toMap
    // the explicit per-shingle pipeline (the CTE form the DuckDB oracle runs)
    val sh = docs
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text)-4, 1), 4)")).as("p"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(substring(text, p, 5)), 1, 15), 16, 10) as bigint)")
          .as("base"))
      .select(col("doc_id"), (col("base") % P).as("x"))
    val mins = (0 until 32).map(j =>
      min((lit(a(j)) * col("x") + lit(b(j))) % P).as(s"s$j"))
    val want = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector).toMap
    assert(got == want)
  }

  test("SQL surface: functions usable via spark.sql after registration") {
    graft.plans.GraftExtensions.register(spark)
    Corpus.pages(spark, 20, 2).toDF().createOrReplaceTempView("pages_sql")
    val n = spark.sql(
      "SELECT graft_term_stats(graft_extract_text(html)).doclen AS dl " +
        "FROM pages_sql WHERE graft_extract_text(html) = text")
      .filter(col("dl") > 0).count()
    assert(n == 20)
    val c = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .head().getDouble(0)
    assert(c == 1.0)
    val sh = spark.sql(
      "SELECT simhash64('a b a').simhash_lo AS lo, " +
        "simhash64('a b a').simhash_hi AS hi").head()
    assert(sh.getLong(0) != 0L || sh.getLong(1) != 0L)
  }

  test("analyze plan has no object-serialization seam") {
    val analyzed = graft.index.SegmentBuilder.analyze(Corpus.pages(spark, 50, 2))
    val plan = analyzed.queryExecution.executedPlan.toString
    // corpus generation itself is a typed map (test-only source); the
    // extract+tokenize stage must not add MapElements/Deserialize steps
    assert(!plan.contains("MapElements graft.index"),
      s"analyze still uses a typed map:\n$plan")
  }
}
