package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.FunctionBridge

/** SQL registration for the engine's custom expressions, so a SQL-first
  * user gets the same surface as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_parse_ts_ms(raw_col) FROM t")
  * }}}
  *
  * For cluster-wide deployment use `graft.GraftSparkExtensions`
  * (`--conf spark.sql.extensions=graft.GraftSparkExtensions`), which
  * injects the same builders into every session at construction.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"graft: $what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Name → expression builder, the single source of truth for both
    * per-session registration and the SparkSessionExtensions path. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_parse_ts_ms" -> (exprs => TimestampMsParse(exprs.head)),
    "graft_parse_date_ymd" -> (exprs => DateYmdParse(exprs.head)),
    "graft_normalize_vec" -> (exprs => NormalizeVec(exprs.head)),
    // graft_word_ngrams(text, n) — n must be a literal
    "graft_word_ngrams" -> (exprs =>
      WordNgrams(exprs.head, intArg(exprs(1), "n"))),
    // graft_char_ngrams(text, n) — n must be a literal
    "graft_char_ngrams" -> (exprs =>
      CharNgrams(exprs.head, intArg(exprs(1), "n"))),
    // graft_lsh_signature(vec, dims[, bands, bits, seed]) — knob args
    // must be literals (they parameterize the plan-constant plane matrix)
    "graft_lsh_signature" -> { exprs =>
      val dims = intArg(exprs(1), "dims")
      val bands = if (exprs.length > 2) intArg(exprs(2), "bands") else 16
      val bits = if (exprs.length > 3) intArg(exprs(3), "bits") else 10
      val seed = if (exprs.length > 4) intArg(exprs(4), "seed").toLong else 97L
      LshSignature(exprs.head, dims, bands, bits, seed)
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      FunctionBridge.register(spark, name, b)
    }
}
