package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, ExtractText, LshBits, MinHashSigs, SimHash64, TermStats}

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions so any SQL-surface user can call
  * them:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  * SELECT graft_extract_text(html) FROM pages
  * }}}
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.defs.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  private[plans] val defs: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_extract_text",
      info("graft_extract_text", "_FUNC_(html) - byte-identical text extraction"),
      (es: Seq[Expression]) => ExtractText(es.head)),
    ("graft_term_stats",
      info("graft_term_stats", "_FUNC_(text) - struct(tfs map, doclen)"),
      (es: Seq[Expression]) => TermStats(es.head)),
    ("cosine_sim",
      info("cosine_sim", "_FUNC_(a, b) - cosine similarity of float vectors"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("lsh_bits",
      info("lsh_bits", "_FUNC_(v) - 8-hyperplane sign-LSH bucket of a float vector"),
      (es: Seq[Expression]) => LshBits(es.head)),
    ("simhash64",
      info("simhash64",
        "_FUNC_(text) - struct(simhash_hi, simhash_lo): 64-bit tf-weighted SimHash"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("minhash_sigs",
      info("minhash_sigs",
        "_FUNC_(text) - array<bigint> of 32 MinHash signature minima"),
      (es: Seq[Expression]) => MinHashSigs(es.head)))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    defs.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
