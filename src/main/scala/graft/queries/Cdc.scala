package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Change-data-capture maintenance operators — the nightly jobs that keep
  * a 100 TB corpus CURRENT: applying an upsert/delete change feed onto the
  * previous snapshot (the batch half of what a lakehouse `MERGE INTO`
  * compiles to). The sibling streaming form is
  * [[graft.queries.Streaming]]'s q_stream_cdc.
  *
  * The synthetic change feed is derived deterministically from the base
  * table itself (key-modulus partition into delete/update/insert classes),
  * so the DuckDB oracle can restate the construction exactly — the same
  * discipline as q_pii_scrub's synthetic contact lines.
  */
object Cdc {

  /** Apply a keyed change feed (inserts, updates, deletes) onto the base
    * `orders` snapshot in ONE pass — the MERGE INTO shape:
    *
    *   - keys ≡ 0 (mod 10): DELETE
    *   - keys ≡ 1,2 (mod 10): UPDATE (reprice +1000, status → 'U')
    *   - keys ≡ 3 (mod 10): INSERT under a fresh key (old key + max key),
    *     half price, status 'I' — arriving rows, not copies
    *
    * Plan shape: ONE full-outer shuffle join on the key, then a row-wise
    * CASE picks survivor columns — no second pass, no window, no
    * driver-side diffing. The max-key scalar for insert-key allocation
    * rides a broadcast 1-row aggregate (the q_tfidf scalar-spine
    * pattern), so nothing collects.
    *
    * 100 TB story: the join key is the snapshot's primary key, so with
    * the snapshot bucketed by key (how a maintained table is stored —
    * q_shard_assign's layout) the nightly merge is a co-located join:
    * only the change feed (≪ snapshot) moves. A skewed feed falls into
    * AQE skew-split like any other shuffle join. Arithmetic stays exact:
    * `+ 1000` and `/ 2` on 2-decimal money doubles are single IEEE ops,
    * identical in both engines. */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val mx = base.agg(max(col("o_orderkey")).as("maxk"))
    val feedSrc = base.crossJoin(broadcast(mx))
    val m = pmod(col("o_orderkey"), lit(10))
    val changes = feedSrc
      .filter(m <= 3)
      .select(
        when(m === 3, col("o_orderkey") + col("maxk"))
          .otherwise(col("o_orderkey")).as("c_key"),
        when(m === 0, "D").when(m === 3, "I").otherwise("U").as("op"),
        col("o_custkey").as("c_custkey"),
        when(m === 3, "I").otherwise("U").as("c_status"),
        when(m === 3, col("o_totalprice") / 2)
          .otherwise(col("o_totalprice") + 1000).as("c_totalprice"))
    base
      .join(changes, col("o_orderkey") === col("c_key"), "full_outer")
      // survivors: base rows the feed doesn't touch, updated rows under
      // their old key, inserted rows under their fresh key; deletes drop
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("c_key")).as("o_orderkey"),
        coalesce(col("c_custkey"), col("o_custkey")).as("o_custkey"),
        when(col("op").isNull, col("o_orderstatus"))
          .otherwise(col("c_status")).as("o_orderstatus"),
        when(col("op").isNull, col("o_totalprice"))
          .otherwise(col("c_totalprice")).as("o_totalprice"),
        coalesce(col("op"), lit("K")).as("merge_op"))
      .orderBy("o_orderkey")
  }

  private val qMergeUpsertOracle =
    """WITH mx AS (SELECT MAX(o_orderkey) AS maxk FROM orders),
      |changes AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey + maxk
      |         ELSE o_orderkey END AS c_key,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
      |         WHEN o_orderkey % 10 = 3 THEN 'I' ELSE 'U' END AS op,
      |    o_custkey AS c_custkey,
      |    CASE WHEN o_orderkey % 10 = 3 THEN 'I' ELSE 'U' END AS c_status,
      |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice / 2
      |         ELSE o_totalprice + 1000 END AS c_totalprice
      |  FROM orders, mx
      |  WHERE o_orderkey % 10 <= 3),
      |merged AS (
      |  SELECT
      |    COALESCE(b.o_orderkey, c.c_key) AS o_orderkey,
      |    COALESCE(c.c_custkey, b.o_custkey) AS o_custkey,
      |    CASE WHEN c.op IS NULL THEN b.o_orderstatus
      |         ELSE c.c_status END AS o_orderstatus,
      |    CASE WHEN c.op IS NULL THEN b.o_totalprice
      |         ELSE c.c_totalprice END AS o_totalprice,
      |    COALESCE(c.op, 'K') AS merge_op
      |  FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.c_key
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_merge_upsert" -> (qMergeUpsert _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_merge_upsert" -> qMergeUpsertOracle
  )
}
