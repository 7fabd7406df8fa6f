package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-18 (verdict #2): [[graft.functions.Md5Sixteenths]] replaces
  * the md5-hex → substring → conv chain in the SimHash signature pass.
  * The DuckDB oracle replays the OLD arithmetic verbatim, so the new
  * kernel must be bit-identical to it on every token — including
  * multi-byte UTF-8, the empty string, and whitespace-heavy text. */
class Md5SixteenthsSpec extends SparkSpec {

  test("md5Sixteenths equals the built-in hex/substring/conv chain on " +
    "every token of the documents corpus") {
    import graft.functions.Md5Sixteenths.md5Sixteenths
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val mismatches = toks
      .withColumn("hs", md5Sixteenths(col("tok")))
      .withColumn("hex", md5(col("tok")))
      .filter((0 until 8).map(k =>
        col("hs").getItem(k) =!=
          conv(substring(col("hex"), 4 * k + 1, 4), 16, 10).cast(LongType))
        .reduce(_ || _))
    assert(mismatches.count() == 0L,
      s"kernel deviates from the oracle arithmetic: ${
        mismatches.limit(3).collect().mkString("; ")}")
  }

  test("md5Hex15 equals conv(substring(md5,1,15),16,10) on every bigram " +
    "of the documents corpus") {
    import graft.functions.Md5Hex15.md5Hex15
    // word bigrams via the same split the dedup path uses — the hash
    // domain is arbitrary strings, bigram-shaped inputs included
    val words = Tables.documents(spark, sf)
      .select(split(trim(col("text")), "\\s+").as("w"))
    val toks = words.select(explode(expr(
      "transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1]))"))
      .as("tok"))
    val mismatches = toks.filter(md5Hex15(col("tok")) =!=
      conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType))
    assert(mismatches.count() == 0L)
    // edge tokens too
    import spark.implicits._
    val bad = Seq("", "é", "日本語 x", "a").toDF("tok")
      .filter(md5Hex15(col("tok")) =!=
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType))
    assert(bad.count() == 0L)
  }

  test("edge tokens: empty string, multi-byte UTF-8, single char") {
    import graft.functions.Md5Sixteenths.md5Sixteenths
    import spark.implicits._
    val df = Seq("", "é", "héllo wörld", "a", "0", "日本語").toDF("tok")
    val bad = df
      .withColumn("hs", md5Sixteenths(col("tok")))
      .withColumn("hex", md5(col("tok")))
      .filter((0 until 8).map(k =>
        col("hs").getItem(k) =!=
          conv(substring(col("hex"), 4 * k + 1, 4), 16, 10).cast(LongType))
        .reduce(_ || _))
    assert(bad.count() == 0L)
    // null propagates (not an 8-zero signature)
    val n = Seq[Option[String]](None).toDF("tok")
      .select(md5Sixteenths(col("tok")).as("hs")).head
    assert(n.isNullAt(0))
  }

  test("interpreted eval matches codegen (the two paths share compute)") {
    import graft.functions.Md5Sixteenths
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("token")
    val viaEval = Md5Sixteenths(lit).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaDf = spark.range(1)
      .select(Md5Sixteenths.md5Sixteenths(
        org.apache.spark.sql.functions.lit("token")).as("hs"))
      .head.getSeq[Long](0)
    assert(viaEval.toSeq == viaDf)
    // and both match java.security MD5 of the UTF-8 bytes directly
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("token".getBytes("UTF-8"))
    val expect = (0 until 8).map(k =>
      (((d(2 * k) & 0xff) << 8) | (d(2 * k + 1) & 0xff)).toLong)
    assert(viaEval.toSeq == expect)
  }
}
