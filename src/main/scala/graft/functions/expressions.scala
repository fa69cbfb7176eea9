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
}
