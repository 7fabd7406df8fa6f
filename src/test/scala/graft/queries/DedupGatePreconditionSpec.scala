package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins the PRECONDITIONS the incremental near-dup hash gates stand on
  * (q_dedup_incremental_near / q_dedup_index_append / q_stream_dedup_near),
  * so a regenerated corpus fails HERE with a named cause instead of as
  * an opaque oracle hash mismatch:
  *
  *  1. banding recall is exactly 1 on the corpus' qualifying (J ≥ τ)
  *     cross-split pairs — 8×4 banding catches a J≈0.5 pair with only
  *     ~0.40 probability, so the gates are only deterministic because
  *     THIS corpus' qualifying pairs sit high enough that the fixed
  *     permutation draw catches every one;
  *  2. planted replay id offsets (+100000 / +200000) clear the organic
  *     doc_id range, so replays can never be conflated with real docs.
  */
class DedupGatePreconditionSpec extends graft.SparkSpec {

  test("banding recall == 1 on every qualifying cross-split pair " +
    "(the q_dedup_incremental_near gate precondition)") {
    val thr = 300L
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < thr).select(col("doc_id"), col("text"))
    val replays = corpus.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(100000L)).as("doc_id"),
        concat(col("text"), lit(" qq7")).as("text"))
    val batch = docs.filter(col("doc_id") >= thr)
      .select(col("doc_id"), col("text")).unionByName(replays)
    // brute-force qualifying pairs (the oracle's ground truth)
    def grams(df: org.apache.spark.sql.DataFrame, id: String, g: String) =
      df.select(col("doc_id").as(id),
        array_distinct(graft.functions.WordNgrams.grams(col("text"), 2)).as(g))
    val truth = grams(batch, "batch_id", "bg")
      .crossJoin(grams(corpus, "corpus_id", "cg"))
      .select(col("batch_id"), col("corpus_id"),
        (size(array_intersect(col("bg"), col("cg"))).cast(DoubleType) /
          size(array_union(col("bg"), col("cg"))).cast(DoubleType)).as("j"))
      .filter(col("j") >= 0.5)
    // candidates from the SAME banding the gated entries use
    val cand = Dedup.minhashBanded(batch).as("x")
      .join(Dedup.minhashBanded(corpus).as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    val missed = truth.join(cand, Seq("batch_id", "corpus_id"), "left_anti")
      .collect()
    assert(missed.isEmpty,
      "CORPUS REGENERATION HAZARD: 8x4 MinHash banding missed " +
        s"qualifying (J>=0.5) cross-split pairs ${missed.mkString(", ")} — " +
        "the q_dedup_incremental_near/q_dedup_index_append/" +
        "q_stream_dedup_near hash gates are no longer deterministic on " +
        "this corpus; raise the gate threshold or the band count before " +
        "trusting them")
  }

  test("replay id offsets clear the organic doc_id/vec_id range at all " +
    "three SFs (planted-replay conflation guard)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxDoc = graft.Tables.documents(spark, dir)
        .agg(max(col("doc_id"))).collect().head.getLong(0)
      assert(maxDoc < 100000L,
        s"CORPUS REGENERATION HAZARD: $dir max doc_id $maxDoc reaches the " +
          "+100000/+200000 replay ranges used by q_dedup_incremental*/" +
          "q_dedup_index_append — replays would conflate with organic docs")
      // q_dedup_embed_incremental needs no range check: its replay
      // offset is DERIVED from max(vec_id)+1 (collision-proof)
    }
  }
}
