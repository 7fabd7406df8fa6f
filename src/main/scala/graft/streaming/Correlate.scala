package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: pair each click with the
  * purchases by the same user that land within `windowSec` after it —
  * the attribution shape (ad impression → conversion) every event
  * pipeline computes.
  *
  * ONE declarative definition serves both modes: on batch inputs the
  * watermark nodes are optimized away and this is a plain interval
  * equi-join; on streaming inputs Spark keeps both sides' state,
  * emits inner matches as they form (append mode), and uses the
  * watermark + the two-sided time bound to EVICT state — click state
  * older than `watermark − windowSec` can never match again and is
  * dropped, so state is bounded by the event rate × window, not by
  * stream length. That eviction bound is the whole 100 TB/day story:
  * without the time-range condition on BOTH event times the join
  * state grows without limit.
  *
  * The join itself shuffles both sides on `user_id` (co-partitioned
  * state store), exactly like the keyed sessionization path.
  */
object Correlate {
  /** `joinType` "inner" (default), "left_outer", or "left_semi":
    * the outer variant also emits never-converted clicks with a null
    * purchase — but only once the watermark proves no match can still
    * arrive (click_ts + window + delay has passed), which is what makes
    * streaming outer joins need watermarks at all. The semi variant
    * emits each converted CLICK exactly once (on its first match;
    * Spark's semi-join state tracks matched keys to suppress
    * re-emission), so the sink equals the batch EXISTS — the
    * "did this impression convert at all" shape, with purchase-side
    * state evicted on the same watermark bound. */
  def clickPurchase(clicks: DataFrame, purchases: DataFrame,
                    windowSec: Int = 3600,
                    watermarkSec: Int = 10,
                    joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts_ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", s"$watermarkSec seconds")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts_ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", s"$watermarkSec seconds")
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
    if (joinType == "left_semi")
      joined.select(col("c_user").as("user_id"), col("click_id"))
    else joined
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts")))
          .as("delta_sec"))
  }
}
