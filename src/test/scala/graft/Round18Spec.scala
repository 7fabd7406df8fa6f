package graft

import org.apache.spark.sql.functions.col

/** Round-18 contract pins: the compaction TRIGGER policy
  * ([[graft.queries.Dedup.shouldCompact]]) — the lifecycle verb the
  * round-17 verdict asked to turn from a memo into a policy. */
class Round18Spec extends SparkSpec {

  test("shouldCompact: false on a fresh index (one file per bucket), " +
    "true once nightly appends cross the files-per-bucket threshold, " +
    "false again after compaction") {
    import graft.queries.Dedup
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val tbl = Dedup.freshIndexName(spark, "graft_idx_policy")
    Dedup.writeBandIndex(spark, Dedup.minhashBanded(docs), tbl,
      Seq("band", "bucket"))
    try {
      assert(!Dedup.shouldCompact(spark, tbl),
        "a freshly created index holds one file per bucket — no trigger")
      // simulate nights: each append lands one more file per bucket.
      // threshold is the knob default (8 files/bucket), so 8 appends
      // on top of the creation file cross it (9 > 8).
      val night = Dedup.minhashBanded(
        docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
      val threshold = Dedup.compactFilesPerBucket
      (1 until threshold).foreach { _ =>
        Dedup.appendBandIndex(spark, night, tbl, Seq("band", "bucket"))
      }
      assert(!Dedup.shouldCompact(spark, tbl),
        s"at exactly $threshold files/bucket the policy must NOT yet fire")
      Dedup.appendBandIndex(spark, night, tbl, Seq("band", "bucket"))
      assert(Dedup.shouldCompact(spark, tbl),
        s"one append past $threshold files/bucket must trip the trigger")
      // the verb the policy points at restores the invariant
      Dedup.compactBandIndex(spark, tbl, Seq("band", "bucket"))
      assert(!Dedup.shouldCompact(spark, tbl),
        "compaction returns every bucket to one file — trigger resets")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl"): Unit
  }

  test("state-store provider defaults follow the measured selection " +
    "rule: rocksdb only for full-keyset/NoTimeout shapes; force conf " +
    "outranks the env knob; transformWithState is not overridable") {
    import graft.queries.Streaming.resolveStateProvider
    // shape defaults (the SCALE.md A/B's conclusion, now code)
    assert(resolveStateProvider("churny", None, None) == "hdfs")
    assert(resolveStateProvider("fullKeyset", None, None) == "rocksdb")
    assert(resolveStateProvider("requiresRocksdb", None, None) == "rocksdb")
    // sweep env knob overrides the shape default
    assert(resolveStateProvider("churny", None, Some("rocksdb")) == "rocksdb")
    assert(resolveStateProvider("fullKeyset", None, Some("hdfs")) == "hdfs")
    // the A/B harness's force conf outranks the env knob (round-17
    // advisory: a leaked env var must not corrupt an arm)
    assert(resolveStateProvider("fullKeyset", Some("hdfs"),
      Some("rocksdb")) == "hdfs")
    assert(resolveStateProvider("churny", Some("rocksdb"),
      Some("hdfs")) == "rocksdb")
    // timers need the multi-column-family store: nothing downgrades it
    assert(resolveStateProvider("requiresRocksdb", Some("hdfs"),
      Some("hdfs")) == "rocksdb")
    // garbage fails loudly, never a silent fallback
    intercept[IllegalArgumentException](
      resolveStateProvider("bogus", None, None))
    intercept[IllegalArgumentException](
      resolveStateProvider("churny", Some("levelDB"), None))
  }

  test("shouldCompact honors an explicit threshold override") {
    import graft.queries.Dedup
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val tbl = Dedup.freshIndexName(spark, "graft_idx_policy2")
    Dedup.writeBandIndex(spark, Dedup.minhashBanded(docs), tbl,
      Seq("band", "bucket"))
    try {
      Dedup.appendBandIndex(spark, Dedup.minhashBanded(
        docs.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 600000L).as("doc_id"), col("text"))),
        tbl, Seq("band", "bucket"))
      assert(Dedup.shouldCompact(spark, tbl, maxFilesPerBucket = 1),
        "2 files/bucket exceeds an explicit threshold of 1")
      assert(!Dedup.shouldCompact(spark, tbl, maxFilesPerBucket = 2),
        "2 files/bucket does not exceed a threshold of 2")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl"): Unit
  }
}
