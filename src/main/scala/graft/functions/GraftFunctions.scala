package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.FunctionBridge

/** SQL registration for the engine's custom expressions, so a SQL-first
  * user gets the same surface as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_parse_ts_ms(raw_col) FROM t")
  * }}}
  */
object GraftFunctions {

  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = {
    require(e.foldable, s"graft: $what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  def register(spark: SparkSession): Unit = {
    FunctionBridge.register(spark, "graft_parse_ts_ms",
      exprs => TimestampMsParse(exprs.head))
    FunctionBridge.register(spark, "graft_parse_date_ymd",
      exprs => DateYmdParse(exprs.head))
    FunctionBridge.register(spark, "graft_normalize_vec",
      exprs => NormalizeVec(exprs.head))
    // graft_word_ngrams(text, n) — n must be a literal
    FunctionBridge.register(spark, "graft_word_ngrams",
      exprs => WordNgrams(exprs.head, intArg(exprs(1), "n")))
    // graft_lsh_signature(vec, dims[, bands, bits, seed]) — knob args
    // must be literals (they parameterize the plan-constant plane matrix)
    FunctionBridge.register(spark, "graft_lsh_signature", { exprs =>
      val dims = intArg(exprs(1), "dims")
      val bands = if (exprs.length > 2) intArg(exprs(2), "bands") else 16
      val bits = if (exprs.length > 3) intArg(exprs(3), "bits") else 10
      val seed = if (exprs.length > 4) intArg(exprs(4), "seed").toLong else 97L
      LshSignature(exprs.head, dims, bands, bits, seed)
    })
  }
}
