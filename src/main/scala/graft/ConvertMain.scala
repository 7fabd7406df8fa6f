package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{IngestPipeline, ProgressTicker}

/** O1: the user-facing conversion CLI, mirroring the reference binary's
  * contract (/root/reference/src/main.rs:39-83):
  *
  *   graft-convert [--inferer-schema-complet] ENTREE
  *
  *  - positional input path; `-` reads stdin into a temp file
  *    (main.rs:102-120 buffers stdin the same way) and writes
  *    `stdin.parquet` in the working directory;
  *  - otherwise the output is `<parent>/<stem>.parquet`
  *    (main.rs:122-137's file_stem derivation);
  *  - `--inferer-schema-complet` switches the 1,000-row inference
  *    sample to a full scan (distributed stats fold);
  *  - no input → help + exit 1; empty stdin → exit 1;
  *  - per-column parse-failure counts print at the end, capped at 10
  *    lines like the reference's column-error display
  *    (analyse.rs:19,63-96), plus a total-errors warning
  *    (conversion.rs:103-110) and a rows/s summary (conversion.rs:112-119).
  *
  * The output is a single input-ordered parquet FILE (not a directory):
  * single-writer parity with the reference's ArrowWriter. The
  * distributed 100 TB path is `IngestPipeline.writeParquet[Partitioned]`
  * — this main is the small-file compatibility surface.
  */
object ConvertMain {

  private[graft] case class Options(input: Option[String], fullScan: Boolean)

  private[graft] def parseArgs(args: Seq[String]): Either[String, Options] = {
    var fullScan = false
    var input: Option[String] = None
    args.foreach {
      case "--inferer-schema-complet" => fullScan = true
      case flag if flag.startsWith("--") => return Left(s"unknown flag: $flag")
      case positional if input.isEmpty => input = Some(positional)
      case extra => return Left(s"unexpected extra argument: $extra")
    }
    Right(Options(input, fullScan))
  }

  /** `<parent>/<stem>.parquet`, exactly main.rs:122-137: the stem strips
    * only the LAST extension; a path with no parent resolves next to
    * the working directory. */
  private[graft] def deriveOutputPath(input: String): String = {
    val p = Paths.get(input)
    val name = p.getFileName.toString
    val dot = name.lastIndexOf('.')
    val stem = if (dot > 0) name.substring(0, dot) else name
    Option(p.getParent) match {
      case Some(parent) => parent.resolve(stem + ".parquet").toString
      case None => stem + ".parquet"
    }
  }

  private[graft] def usage: String =
    """Convert a tabular file (CSV/TSV) to Parquet
      |
      |Usage: graft-convert [--inferer-schema-complet] ENTREE
      |
      |  ENTREE                     input path, or '-' for stdin
      |  --inferer-schema-complet   infer the schema from the whole file
      |                             instead of a 1,000-row sample""".stripMargin

  /** Per-column error lines with the reference's display cap of 10
    * (LIMITE_AFFICHAGE_ERREURS_COLONNES, analyse.rs:19): at most 10
    * column lines print, the rest collapse into one masked notice. */
  private[graft] def errorReport(counts: Map[String, Long]): Seq[String] = {
    val bad = counts.filter(_._2 > 0).toSeq.sortBy(_._1)
    val shown = bad.take(10).map { case (c, n) => s"[COLUMN ERRORS] $c: $n parse failures" }
    if (bad.size > 10) shown :+ "[WARN] additional column errors masked (display capped at 10)"
    else shown
  }

  /** Run a conversion; returns (outputPath, rowCount, totalErrors).
    * Factored out of main() so specs can drive it on a test session. */
  def run(spark: SparkSession, opts: Options,
          err: String => Unit = Console.err.println(_)): (String, Long, Long) = {
    val (inputPath, outputPath) = opts.input match {
      case Some("-") =>
        val buf = System.in.readAllBytes()
        if (buf.isEmpty) throw new IllegalArgumentException("empty stdin")
        val tmp = Files.createTempFile("graft_stdin", ".tsv")
        Files.write(tmp, buf)
        err(s"[INFO] stdin written to $tmp")
        (tmp.toString, "stdin.parquet")
      case Some(file) =>
        if (!Files.exists(Paths.get(file)))
          throw new IllegalArgumentException(s"input not found: $file")
        (file, deriveOutputPath(file))
      case None => throw new IllegalArgumentException("no input provided")
    }

    val t0 = System.nanoTime()
    val delim = IngestPipeline.detectDelimiter(spark, inputPath)
    val raw = IngestPipeline.readRaw(spark, inputPath, delim)
    val schema = IngestPipeline.inferSchema(raw, opts.fullScan)
    err(s"[OK] schema detected: ${schema.fields.length} columns")
    err(s"[CONF] row-group block = ${IngestPipeline.rowGroupRows(schema.fields.length)} rows")

    // the reference pre-counts lines for its progress bar total
    // (conversion.rs:66); cheap driver-side count for local files only
    val totalRows = {
      val p = Paths.get(inputPath)
      if (Files.isRegularFile(p))
        Some(scala.util.Using.resource(Files.lines(p))(_.count()) - 1)
      else None
    }

    val ticker = new ProgressTicker(spark, totalRows, err)
    ticker.start()
    val obs = org.apache.spark.sql.Observation("graft_convert")
    val rows = try {
      // input-order single-file parity: tag each raw row with its scan
      // position BEFORE casting, sort on the cheap raw side (Spark
      // samples a sort's child — sorting before the cast projection
      // evaluates the kernels once), cast, and collapse to one file.
      //
      // Error accounting rides the SAME job via Dataset.observe — the
      // distributed twin of the reference's inline atomics
      // (analyse.rs:15-23) — so the input is scanned exactly once. The
      // CollectMetrics node sits ABOVE the sort: the range partitioner's
      // sampling pass only evaluates the sort's child, so placing the
      // counters above it keeps each row counted exactly once.
      val rawIdx = raw.withColumn("_graft_row", monotonically_increasing_id())
      val counted = rawIdx.orderBy("_graft_row")
        .observe(obs, count(lit(1)).as("_rows"), IngestPipeline.errorCountExprs(schema): _*)
      val typed = IngestPipeline.applySchema(counted, schema)
      IngestPipeline.writeParquetSingleFile(typed, outputPath)
      obs.get("_rows").asInstanceOf[Long]
    } finally ticker.stop()

    val metrics = obs.get
    val errorCounts = schema.fields.zipWithIndex.map { case (f, i) =>
      f.name -> (metrics(s"_err_$i") match {
        case null => 0L
        case n: java.lang.Number => n.longValue()
      })
    }.toMap
    errorReport(errorCounts).foreach(err)
    val totalErrors = errorCounts.values.sum
    if (totalErrors > 0)
      err(s"[WARN] finished with errors: $totalErrors failed values")
    val secs = (System.nanoTime() - t0) / 1e9
    err(f"[SUCCESS] finished in $secs%.2f s (~${secs * 1e6 / math.max(rows, 1)}%.2f us/row, ~${rows / secs}%.0f rows/s)")
    (outputPath, rows, totalErrors)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toSeq) match {
      case Left(msg) =>
        Console.err.println(usage); Console.err.println(s"Error: $msg")
        sys.exit(1)
      case Right(o) if o.input.isEmpty =>
        Console.err.println(usage); Console.err.println("Error: no input provided")
        sys.exit(1)
      case Right(o) => o
    }
    val spark = SparkSession.builder()
      .appName("graft-convert")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (out, _, _) = run(spark, opts)
      Console.err.println(s"[SUCCESS] conversion complete: $out")
    } catch {
      case e: Exception =>
        Console.err.println(s"Error: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }
}
