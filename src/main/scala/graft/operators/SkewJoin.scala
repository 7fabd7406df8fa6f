package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (probe) side N ways and
  * replicate the build side per salt, so one hot key spreads over N
  * shuffle partitions instead of melting a single task at 100 TB.
  *
  * AQE's OptimizeSkewedJoin handles moderate skew automatically at
  * runtime; explicit salting is for the pathological case (one key =
  * double-digit % of the table) where even a split partition re-skews,
  * or when AQE is unavailable (streaming joins, forced SMJ pipelines).
  *
  * The salt must be DETERMINISTIC per row (a hash of row-distinguishing
  * columns, never rand()) — nondeterministic salts break retries and
  * any hash-compared output.
  */
object SkewJoin {

  /** @param saltSource row-distinguishing column(s) on the big side
    *                   (e.g. a line number) hashed into [0, salts). */
  def saltedJoin(bigSkewed: DataFrame, small: DataFrame,
                 joinKeys: Seq[(String, String)], saltSource: Column,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // The small side is REPLICATED per salt: join types that emit
    // unmatched small-side rows (right/full outer) would emit each such
    // row `salts` times. Only big-side-preserving types are sound here.
    val okTypes = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(okTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched replicated rows")
    val salted = bigSkewed.withColumn("_graft_salt", pmod(hash(saltSource), lit(salts)))
    val replicated = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val cond = joinKeys.map { case (b, s) => salted(b) === replicated(s) }
      .reduce(_ && _) && salted("_graft_salt") === replicated("_graft_salt")
    salted.join(replicated, cond, joinType)
      .drop("_graft_salt")
  }
}
