package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The codegen char-n-gram kernel must match the higher-order
  * formulation byte-for-byte, element order included — it substitutes
  * into the oracle-checked q_langid_trigram, so any divergence moves a
  * hash. */
class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def hofExpr(n: Int) =
    expr(s"""case when length(s) >= $n
            |  then transform(sequence(1, length(s) - ${n - 1}),
            |    i -> substring(s, i, $n))
            |  else cast(array() as array<string>) end""".stripMargin)

  private val corpus = Seq(
    "abcdef", "ab", "a", "", " ", "abc",
    "the quick brown fox",
    "aa bb cc",
    "éàüß unicode chars", // 2-byte UTF-8
    "日本語テキスト",        // 3-byte UTF-8
    "mixed é日x ascii",
    "astral 𝄞 clef 😀 pair", // supplementary-plane code points
    "x" * 500 // long doc
  ).toDF("s")

  test("kernel == HOF formulation for n in 1..4, order and bytes") {
    (1 to 4).foreach { n =>
      val rows = corpus.select(
        CharNgrams.grams(col("s"), n).as("k"), hofExpr(n).as("h")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch:\n kernel=${r.getSeq[String](0)}\n hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("kernel == HOF on the real documents table (n=3, normalized)") {
    val d = Tables.documents(spark, sf)
      .select(regexp_replace(lower(col("text")), "[^a-z]+", " ").as("s"))
    val diff = d.select(CharNgrams.grams(col("s"), 3).as("k"),
        hofExpr(3).as("h"))
      .filter(not(col("k") === col("h")))
      .count()
    assert(diff == 0L, s"$diff docs diverge from the HOF form")
  }

  test("SQL registration: graft_char_ngrams usable from spark.sql") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_char_ngrams('abcd', 2) AS g").head.getSeq[String](0)
    assert(out == Seq("ab", "bc", "cd"))
  }
}
