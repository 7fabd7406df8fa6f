package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins graft_intersect_count == size(array_intersect(a, b)) — the
  * identity the round-20 dedup verify stages rely on — on the real
  * corpus pair sample and on duplicate/null/empty adversarial inputs. */
class IntersectCountSpec extends SparkSpec {

  test("kernel == size(array_intersect) on the real corpus pair sample") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(graft.functions.WordNgrams.grams(col("text"), 2))
          .as("grams"))
    val a = d.select(col("doc_id").as("a_id"), col("grams").as("a_grams"))
    val b = d.select(col("doc_id").as("b_id"), col("grams").as("b_grams"))
    val diff = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(
        size(array_intersect(col("a_grams"), col("b_grams"))).as("old"),
        IntersectCount.intersectCount(col("a_grams"), col("b_grams")).as("neu"))
      .filter(not(col("old") <=> col("neu")))
      .count()
    assert(diff === 0L)
  }

  test("kernel == size(array_intersect) on duplicates, nulls, empties") {
    import spark.implicits._
    val rows: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "b", "b")),      // dups both sides
      (Seq("a", null, "b"), Seq(null, "b")),         // null in both
      (Seq("a", null), Seq("a")),                    // null one side
      (Seq(), Seq("a")),                             // empty
      (Seq(), Seq()),
      (Seq("x"), Seq("y")))
    val df = rows.toDF("a", "b")
    val out = df.select(
        size(array_intersect(col("a"), col("b"))).as("old"),
        IntersectCount.intersectCount(col("a"), col("b")).as("neu"))
      .collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
    // NULL array propagates like the built-in
    val n = df.select(
        size(array_intersect(lit(null).cast("array<string>"), col("b"))).as("old"),
        IntersectCount.intersectCount(
          lit(null).cast("array<string>"), col("b")).as("neu"))
      .collect()
    n.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }
}
