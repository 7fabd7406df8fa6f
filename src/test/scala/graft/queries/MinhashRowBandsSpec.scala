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

  test("property: per-row fold == aggregation band keys on adversarial " +
    "synthetic texts (round-15 fuzz discipline)") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val words = Vector("a", "b", "xyz", "Zyx", "héllo", "wörld", "123",
      "qq7", "the", "of", "éé", "longtoken" * 8)
    def randDoc(n: Int): String =
      (0 until n).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    val texts = Seq("", " ", "\t \t", "solo", "a a", "a a a", "a b a b",
      "  padded   tokens  ") ++
      (0 until 80).map(i => randDoc(rng.nextInt(60))) ++
      Seq(randDoc(500)) // long doc: many repeated bigrams, distinct-set path
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val agg = Dedup.minhashBanded(docs)
      .select(col("doc_id"), col("band"), col("bucket"))
      .collect().map(_.toString).sorted.toSeq
    val rowBands = docs
      .select(col("doc_id"), Dedup.minhashBandsPerRow(col("text")).as("bands"))
    val row = rowBands.filter(col("bands").isNotNull)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
      .collect().map(_.toString).sorted.toSeq
    assert(agg.nonEmpty && agg == row,
      s"fuzz band-key drift: ${agg.size} agg vs ${row.size} row rows")
    // gram-less docs: the agg form emits NO row, the fold form yields
    // NULL — both mean absent-from-index (the documented contract)
    val nullIds = rowBands.filter(col("bands").isNull)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val aggIds = Dedup.minhashBanded(docs)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(nullIds.intersect(aggIds).isEmpty &&
      (nullIds ++ aggIds) == texts.indices.map(_.toLong).toSet,
      s"NULL/absent partition mismatch: null=$nullIds agg=${aggIds.size}")
    // the shingle-less inputs are exactly the <2-word texts
    assert(nullIds.contains(0L) && nullIds.contains(3L) && !nullIds.contains(4L))
  }

  test("SQL-form graft_minhash_bands == Column form byte-identically on the corpus") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("mh_docs")
    // the SQL registration path must produce the SAME band keys as the
    // Column bridge — a drift here would let spark.sql users build an
    // index the Scala probe can't hit
    val sqlForm = spark.sql(
      """SELECT doc_id, b.pos AS band, b.col AS bucket
        |FROM mh_docs
        |LATERAL VIEW posexplode(graft_minhash_bands(
        |  array_distinct(graft_word_ngrams(text, 2)))) b""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    val colForm = docs
      .select(col("doc_id"),
        posexplode(Dedup.minhashBandsPerRow(col("text")))
          .as(Seq("band", "bucket")))
      .collect().map(_.toString).sorted.toSeq
    assert(sqlForm.nonEmpty && sqlForm == colForm,
      s"SQL/Column drift: ${sqlForm.take(2)} vs ${colForm.take(2)}")
  }

  test("SQL-form graft_argmax_dot == Column form on the embeddings corpus") {
    graft.functions.GraftFunctions.register(spark)
    val cents = Seq(Array(1.0, 0.0, 0.5, 0.0), Array(0.0, 1.0, 0.0, 0.5),
      Array(0.25, 0.25, 0.25, 0.25))
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(slice(col("embedding"), 1, 4),
          x => x.cast("double")).as("v"))
    emb.createOrReplaceTempView("ad_vecs")
    val matSql = cents.flatten.mkString("array(", ", ", ")")
    val sqlForm = spark.sql(
      s"SELECT vec_id, graft_argmax_dot(v, $matSql, 4) AS c FROM ad_vecs")
      .collect().map(_.toString).sorted.toSeq
    val colForm = emb
      .select(col("vec_id"),
        graft.functions.ArgmaxDot.argmaxDot(col("v"), cents).as("c"))
      .collect().map(_.toString).sorted.toSeq
    assert(sqlForm.nonEmpty && sqlForm == colForm)
  }

  test("graft_minhash_bands REJECTS containsNull=true arrays at analysis") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // Seq[String] encodes as ARRAY<STRING> containsNull=true — exactly
    // the schema whose null elements would drift from the aggregation
    // twin (which hashes null tokens to the seed); the expression must
    // fail analysis loudly instead of silently skipping nulls
    val df = Seq(Seq("a b", "b c")).toDF("grams")
    df.createOrReplaceTempView("mh_nullable")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_bands(grams) FROM mh_nullable").collect()
    }
    assert(e.getMessage.contains("containsNull"), s"got: ${e.getMessage}")
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
