package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The codegen n-gram kernel must match the higher-order formulation
  * byte-for-byte, element order included — it substitutes into
  * oracle-checked queries, so any divergence moves a hash. */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def hof(n: Int) = {
    val w = split(trim(col("s")), "\\s+")
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array())
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", "a", "", " ", "   ",
    "  leading and trailing  ",
    "double  spaced   words here",
    "tab\tseparated\tstays one token? no: \\s+ splits",
    "exactly five words right here now",
    "unicode Münich Zürich tokens",
    "x " * 200 // long repetitive doc
  ).toDF("s")

  test("kernel == HOF formulation for n in 2..5, order and bytes") {
    (2 to 5).foreach { n =>
      val rows = corpus.select(
        WordNgrams.grams(col("s"), n).as("k"), hof(n).as("h")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch:\n kernel=${r.getSeq[String](0)}\n hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("kernel == HOF on the real documents table (n=2 and n=5)") {
    Seq(2, 5).foreach { n =>
      val d = Tables.documents(spark, sf).withColumnRenamed("text", "s")
      val diff = d.select(WordNgrams.grams(col("s"), n).as("k"), hof(n).as("h"))
        .filter(col("k") =!= col("h")).count()
      assert(diff == 0, s"n=$n: $diff rows diverge")
    }
  }

  test("SQL registration: graft_word_ngrams(text, n)") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_word_ngrams('a b c', 2) AS g")
      .head.getSeq[String](0)
    assert(r == Seq("a b", "b c"))
  }

  test("interpreted and codegen paths agree") {
    // force interpreted eval via direct Expression evaluation
    val e = WordNgrams(org.apache.spark.sql.catalyst.expressions.Literal("a b c d"), 2)
    val v = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(v.numElements() == 3)
    assert((0 until 3).map(i => v.getUTF8String(i).toString) ==
      Seq("a b", "b c", "c d"))
  }
}
