package graft.queries

import org.apache.spark.sql.functions._

/** Pins [[Dedup.minhashBandsPerRow]] (the shuffle-free fold form the
  * streaming probe uses) byte-identical to [[Dedup.minhashBanded]]'s
  * aggregation form: same permutation minima (min over the same
  * multiset), same 4-arg xxhash64 band keys — a drift between the two
  * would silently zero the stream probe's recall against a corpus
  * index built by the batch form.
  */
class MinhashRowBandsSpec extends graft.SparkSpec {

  test("per-row fold band keys == aggregation-form band keys on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val agg = Dedup.minhashBanded(docs)
      .select(col("doc_id"), col("band"), col("bucket"))
      .collect().map(_.toString).sorted.toSeq
    val row = docs
      .select(col("doc_id"),
        posexplode(Dedup.minhashBandsPerRow(col("text")))
          .as(Seq("band", "bucket")))
      .collect().map(_.toString).sorted.toSeq
    assert(agg.nonEmpty && agg == row,
      s"band-key drift: agg ${agg.take(2)} vs row ${row.take(2)}")
  }

  test("shingle-less docs yield NULL bands (absent-from-index semantics)") {
    import spark.implicits._
    // one-word docs have zero bigrams; the agg form emits no signature
    // row for them, so the per-row form must posexplode to NOTHING
    val docs = Seq((1L, "single"), (2L, "two words here")).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"),
        posexplode(Dedup.minhashBandsPerRow(col("text")))
          .as(Seq("band", "bucket")))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(1L), s"shingle-less doc produced bands: $out")
    assert(out(2L) == 8L, s"expected 8 bands for doc 2: $out")
  }
}
