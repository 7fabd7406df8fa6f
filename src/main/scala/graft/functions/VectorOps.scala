package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `Array[Float]` embedding columns, built from Spark's
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd Catalyst
  * expressions, no UDFs, scale-independent.
  *
  * Determinism note: `aggregate(..., lit(0.0), _+_)` is a SEQUENTIAL
  * left fold per row, and DuckDB's `list_reduce` folds the same way
  * (seedless, but 0.0+x ≡ x for finite x), so both engines produce
  * bit-identical doubles — the oracle can compare raw cosines with no
  * rounding slack.
  */
object VectorOps {

  /** Sequential-fold dot product of two float vectors as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalized double vector: factor the norm out ONCE per vector so
    * pairwise stages need only a dot product (1 fold/pair instead of 3). */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast(DoubleType) / n)
  }

  /** Dot product of two already-double vectors (same sequential fold). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normalizedSql(a: String): String =
    s"list_transform($a, x -> CAST(x AS DOUBLE) / sqrt(${dotSql(a, a)}))"

  /** All-pairs cosine above a threshold via a broadcast block
    * nested-loop: the (bounded) right side ships to every task once and
    * the left side streams per-partition through primitive-array loops.
    * Higher-order-function folds evaluate interpreted per element
    * (~µs/pair); this path runs the identical arithmetic — normalize
    * then ascending-index dot, bit-for-bit the list_reduce order — at
    * memory bandwidth. At scale the left side stays fully distributed;
    * only the broadcast side must fit an executor (tile it beyond that).
    */
  def pairwiseCosinePairs(vecs: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                          threshold: Double): org.apache.spark.sql.DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    def norm(a: Array[Float]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      val n = math.sqrt(s)
      val out = new Array[Double](a.length)
      i = 0
      while (i < a.length) { out(i) = a(i).toDouble / n; i += 1 }
      out
    }
    val right = spark.sparkContext.broadcast(
      vecs.collect().sortBy(_._1).map { case (id, v) => (id, norm(v)) })
    vecs.mapPartitions { it =>
      val r = right.value
      it.flatMap { case (aId, aRaw) =>
        val a = norm(aRaw)
        r.iterator.filter(_._1 > aId).flatMap { case (bId, b) =>
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          if (s >= threshold) Some((aId, bId, s)) else None
        }
      }
    }.toDF("a_id", "b_id", "cosine")
  }

  def dotDSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  p -> p[1] * p[2]), (x, y) -> x + y)""".stripMargin

  /** DuckDB mirrors: identical fold order and double arithmetic. */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
