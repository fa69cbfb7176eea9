package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.analysis.Tokenizer
import graft.extract.HtmlText

/** Native Catalyst expressions for the analyze hot path.
  *
  * The extraction/tokenization stage was first written as a typed
  * `Dataset.map`, which forces DeserializeToObject → MapElements →
  * SerializeFromObject around every row (PlanSpec showed the seam).
  * These expressions keep the whole pages→analyzed pipeline columnar and
  * inside one WholeStageCodegen span: `doGenCode` emits a static call, so
  * no Row ↔ object conversion and no UDF boxing.
  */
object ExtractTextExpr {
  /** Static entry the generated code calls. */
  def extract(html: Array[Byte]): UTF8String =
    UTF8String.fromString(HtmlText.extract(html))
}

/** HTML bytes → extracted text (the byte-identical extractor, §FIXTURES 3). */
case class ExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ExtractTextExpr.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExtractTextExpr.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractText =
    copy(child = newChild)
}

object TermStatsExpr {
  /** Static entry the generated code calls: text → (tfs map, doclen). */
  def termStats(text: UTF8String): InternalRow = {
    val (tfs, dl) = Tokenizer.termFreqs(text.toString)
    val keys = new Array[Any](tfs.size)
    val vals = new Array[Any](tfs.size)
    var i = 0
    tfs.foreach { case (t, tf) =>
      keys(i) = UTF8String.fromString(t); vals(i) = tf; i += 1
    }
    InternalRow(
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals)),
      dl)
  }

  val schema: StructType = StructType(Seq(
    StructField("tfs", MapType(StringType, IntegerType, valueContainsNull = false),
      nullable = false),
    StructField("doclen", IntegerType, nullable = false)))
}

/** text → struct(tfs map<string,int>, doclen int) in one tokenize pass. */
case class TermStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TermStatsExpr.schema
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TermStatsExpr.termStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermStatsExpr.termStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TermStats =
    copy(child = newChild)
}

object CosineSimExpr {
  /** Dot-product cosine over two float vectors, accumulated in Double in
    * ascending index order (deterministic).
    */
  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
             b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** cosine(array<float>, array<float>) — the ANN hot-loop as one codegen'd
  * expression instead of an aggregate(zip_with(...)) lambda chain.
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimExpr.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object LshBitsExpr {
  /** Sign-random-projection LSH over a float vector: deterministic
    * integer hyperplanes (weight(i, j) = ((i*31 + j*17) % 7) - 3), dot
    * accumulated in Double in ascending index order — the same math the
    * DuckDB oracle expresses as aggregate(zip_with(...)), as one tight
    * codegen'd loop. Planes [from, from+num) map to bits [0, num), so
    * disjoint plane ranges give INDEPENDENT hash tables (the banding
    * trick near-dup detection needs to keep recall without widening the
    * per-table bucket count).
    */
  val Planes = 8

  def bits(a: org.apache.spark.sql.catalyst.util.ArrayData,
           from: Int, num: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var j = 0
    while (j < num) {
      val plane = from + j
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += a.getFloat(i).toDouble * (((i * 31 + plane * 17) % 7) - 3)
        i += 1
      }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

/** lsh_bits(array<float>) → long bucket id of hyperplane sign bits
  * [from, from+num) (default: the original single 8-bit table).
  */
case class LshBits(child: Expression, from: Int = 0,
                   num: Int = LshBitsExpr.Planes) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LshBitsExpr.bits(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      from, num)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBitsExpr.bits($c, $from, $num)")

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Hyperplane sign bits of one term, packed LSB-first: bit (b-1) of the
    * result is "bit b" in the reference formulation — bit ((b-1)%4) of
    * md5-hex digit ((b+3)/4). Digit d is the d-th hex character, i.e. the
    * high nibble of md5 byte (d-1)/2 for odd d, low nibble for even d —
    * so the packed long is just the first 8 md5 bytes, nibble-swapped,
    * each nibble kept LSB-first.
    */
  def planeBits(md5: Array[Byte]): Long = {
    var bits = 0L
    var i = 0
    while (i < 8) {
      val b = md5(i) & 0xFF
      bits |= ((b >>> 4).toLong << (8 * i)) | ((b & 0xF).toLong << (8 * i + 4))
      i += 1
    }
    bits
  }

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** term → packed hyperplane bits, cached (terms repeat heavily across a
    * corpus; the cap keeps a pathological vocabulary from pinning the
    * executor heap — past it, terms hash uncached).
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val CacheCap = 1 << 20

  private def planesOf(term: String): Long = {
    val hit = cache.get(term)
    if (hit != null) return hit.longValue()
    val md = digest.get()
    md.reset()
    val v = planeBits(md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    if (cache.size() < CacheCap) cache.put(term, v)
    v
  }

  /** One pass per doc: whitespace-split (Spark split(text,' ') semantics —
    * limit -1, empty tokens kept), tf-weighted ±1 votes on 64 md5-bit
    * hyperplanes, sign bits reported as two 32-bit halves in longs
    * (hi = bits 33..64, lo = bits 1..32) — byte-identical to the previous
    * groupBy/explode column pipeline and to the DuckDB oracle CTEs.
    */
  def simhash(text: UTF8String): InternalRow = {
    val tf = scala.collection.mutable.HashMap.empty[String, Int]
    val toks = text.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      tf.update(toks(i), tf.getOrElse(toks(i), 0) + 1)
      i += 1
    }
    val votes = new Array[Long](64)
    tf.foreach { case (term, wi) =>
      val w = wi.toLong
      val planes = planesOf(term)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((planes >>> b) & 1L) == 1L) w else -w)
        b += 1
      }
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= 1L << b
      if (votes(b + 32) > 0) hi |= 1L << b
      b += 1
    }
    InternalRow(hi, lo)
  }

  val schema: StructType = StructType(Seq(
    StructField("simhash_hi", LongType, nullable = false),
    StructField("simhash_lo", LongType, nullable = false)))
}

/** text → struct(simhash_hi, simhash_lo): the 64-bit tf-weighted SimHash
  * signature as one codegen'd pass per doc — replaces a 64-way bit
  * explode + three aggregations (the former column pipeline cost ~5s at
  * sf0.1; the oracle keeps the explicit CTE form, only results must
  * match).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = SimHash64Expr.schema
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashSigsExpr {
  /** Constants shared with the DuckDB oracle CTEs (SparkEntry generates
    * the SQL from the same values, so they can never drift).
    */
  val P = 1073741789L // prime < 2^30
  val NumPerms = 32
  def a(j: Int): Long = 976369L + j * 104729L
  def b(j: Int): Long = 188029L + j * 130363L

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One pass per doc: 5-char shingles at stride 4 (code-POINT indexed,
    * matching Spark `substring`/DuckDB `substr` character semantics),
    * md5 per shingle, first 15 hex digits as bigint (= big-endian first
    * 8 md5 bytes >>> 4) mod P, then 32 affine permutation minima —
    * byte-identical to the explode → md5 → conv → groupBy(32 mins)
    * column pipeline it replaces, without the O(shingles) row shuffle.
    */
  def sigs(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val md = digest.get()
    // code point start offsets (UTF-16 units); cpStarts(n) = s.length
    val nCp = s.codePointCount(0, s.length)
    val mins = new Array[Long](NumPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // sequence(1, greatest(nCp-4, 1), 4): 1-based shingle starts
    val hi = math.max(nCp - 4, 1)
    var p = 1
    var off = 0 // UTF-16 offset of code point (p-1)
    while (p <= hi) {
      // shingle = code points [p-1, p+4) clipped to the string
      val startOff = math.min(off, s.length)
      val endOff =
        if (p - 1 >= nCp) startOff
        else s.offsetByCodePoints(startOff, math.min(5, nCp - (p - 1)))
      md.reset()
      val h = md.digest(s.substring(startOff, endOff)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits as a non-negative long (< 2^60)
      var be = 0L
      var i = 0
      while (i < 8) { be = (be << 8) | (h(i) & 0xFFL); i += 1 }
      val x = (be >>> 4) % P
      var j = 0
      while (j < NumPerms) {
        val v = (a(j) * x + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      // advance 4 code points (stride), stopping at the string end
      if (p + 4 <= nCp + 1)
        off = s.offsetByCodePoints(off, math.min(4, nCp - (p - 1)))
      p += 4
    }
    val out = new Array[Any](NumPerms)
    var j = 0
    while (j < NumPerms) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }
}

/** text → array<bigint> of 32 MinHash signature minima as one codegen'd
  * pass per doc — replaces a per-shingle explode + md5 + 32-aggregate
  * groupBy (an O(corpus-shingles) shuffle; the former pipeline cost
  * ~5s at sf0.1 and was the bulk of q_dedup_jaccard's wall time). The
  * DuckDB oracle keeps the explicit CTE form; only results must match.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsExpr.sigs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigsExpr.sigs($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** Column-API wrappers. */
object functions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def extract_text(html: Column): Column = col(ExtractText(expr(html)))
  def term_stats(text: Column): Column = col(TermStats(expr(text)))
  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))
  def lsh_bits(v: Column): Column = col(LshBits(expr(v)))
  def lsh_bits(v: Column, from: Int, num: Int): Column =
    col(LshBits(expr(v), from, num))
  def simhash64(text: Column): Column = col(SimHash64(expr(text)))
  def minhash_sigs(text: Column): Column = col(MinHashSigs(expr(text)))
}
