package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.{IngestPipeline, ScalarParse}

/** `spark.read.format("graft").load(path)` — the conversion pipeline as
  * a first-class DataSourceV2 source: delimiter detection + reference
  * schema inference happen at planning time (TableProvider.inferSchema),
  * and the typed conversion happens inside the source's partition
  * readers, so a user gets reference-typed rows from ONE read with no
  * intermediate all-string frame.
  *
  * Scale behavior: one input partition per file (a delimited file's
  * header line and its line-oriented records make per-file the honest
  * split unit without quote-aware offset scanning — the reference is
  * line-based too); a directory of N part files reads N-wide. Column
  * pruning is pushed into the reader (SupportsPushDownRequiredColumns):
  * unprojected columns are never parsed, mirroring what the parquet
  * path gets from Catalyst for free.
  *
  * Conversion semantics delegate to the SAME pure kernels the pipeline
  * uses (ScalarParse/unit scaling/u64 policy) — GraftSourceSpec pins
  * row-for-row equality against `IngestPipeline.convert`.
  *
  * Options: `sep` (override detection), `fullScan` (full-file
  * inference).
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft source requires a path: spark.read.format(\"graft\").load(path)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    val delim = GraftDataSource.sepOption(options)
      .getOrElse(IngestPipeline.detectDelimiter(spark, path))
    val raw = IngestPipeline.readRaw(spark, path, delim)
    IngestPipeline.inferSchema(raw, options.getBoolean("fullScan", false))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftTable(schema, new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = true

  private class GraftTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
    override def name(): String = s"graft(${pathOf(options)})"
    override def schema(): StructType = schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
      val spark = SparkSession.active
      val path = pathOf(options)
      val delim = GraftDataSource.sepOption(options)
        .getOrElse(IngestPipeline.detectDelimiter(spark, path))
      new GraftScanBuilder(schema, path, delim)
    }
  }

  private class GraftScanBuilder(full: StructType, path: String, delim: Char)
    extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters with SupportsPushDownLimit
      with Scan with Batch
      with SupportsReportStatistics {

    private var required: StructType = full
    private var pushed: Array[sources.Filter] = Array.empty
    private var limit: Int = -1

    /** LIMIT reaches the reader: each partition stops parsing after
      * `limit` surviving rows instead of scanning its file to EOF —
      * `df.limit(n)` over a huge delimited file reads ~n lines per
      * partition, not the corpus. Partial pushdown (the default): Spark
      * keeps the global limit above, the source just stops early. */
    override def pushLimit(l: Int): Boolean = { limit = l; true }

    override def pruneColumns(requiredSchema: StructType): Unit =
      // preserve our field metadata (ts unit / unsigned): prune by name
      required = StructType(requiredSchema.fieldNames.flatMap(n =>
        full.fields.find(_.name == n)))

    /** Accept every filter the reader can evaluate exactly (it runs the
      * same converters, so pushed evaluation ≡ post-scan evaluation);
      * the rest stay residual for Spark. Accepted filters are REMOVED
      * from the post-scan plan — their columns may then be pruned away
      * entirely, which is the point: a filtered graft read parses only
      * filter + projected columns and materializes only survivors. */
    override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
      val (ok, residual) = filters.partition(GraftFilterEval.supported(full, _))
      pushed = ok
      residual
    }
    override def pushedFilters(): Array[sources.Filter] = pushed

    override def build(): Scan = this
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft $path sep='$delim' PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
        (if (limit >= 0) s" PushedLimit: $limit" else "")

    override def planInputPartitions(): Array[InputPartition] = {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      val root = new Path(path)
      val fs = root.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root)
            .filter(s => s.isFile && GraftDataSource.isDataFile(s.getPath.getName))
            .map(_.getPath.toString).sorted
        else Array(path)
      files.map(f =>
        GraftFilePartition(f, full, required, delim, pushed, limit): InputPartition)
    }

    /** Input-byte statistics from the filesystem (a metadata-only
      * listing), so Catalyst can pick broadcast joins for small graft
      * reads the same way it does for parquet. Typed rows are narrower
      * than their delimited text, so file size is a safe (over-)
      * estimate of scan size. */
    override def estimateStatistics(): Statistics = new Statistics {
      private val bytes: Long =
        try {
          val conf = SparkSession.active.sparkContext.hadoopConfiguration
          val root = new Path(path)
          val fs = root.getFileSystem(conf)
          val st = fs.getFileStatus(root)
          if (st.isDirectory)
            fs.listStatus(root)
              .filter(s => s.isFile && GraftDataSource.isDataFile(s.getPath.getName))
              .map(_.getLen).sum
          else st.getLen
        } catch { case _: Exception => Long.MaxValue }
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
          new GraftPartitionReader(partition.asInstanceOf[GraftFilePartition])
      }
  }
}

object GraftDataSource {
  /** Spark's hidden-file convention: '_' (markers like _SUCCESS) and
    * '.' (sidecars like .crc, editor droppings) are metadata, not data. */
  def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** The `sep` option must be exactly one character — silently taking
    * `head` would read a literally-typed "\\t" as '\\'. */
  def sepOption(options: CaseInsensitiveStringMap): Option[Char] =
    Option(options.get("sep")).map { s =>
      require(s.length == 1,
        s"graft option 'sep' must be a single character, got ${s.length}: '$s'")
      s.head
    }
}

/** Serializable per-file split: the FULL inferred schema (for token
  * positions), the pruned schema to emit, the delimiter, and the
  * filters accepted for reader-side evaluation. */
case class GraftFilePartition(file: String, full: StructType,
                              required: StructType, delim: Char,
                              filters: Array[sources.Filter] = Array.empty,
                              limit: Int = -1)
  extends InputPartition

/** Line reader + per-value conversion through the reference kernels.
  * Only required columns are parsed.
  *
  * The reader builds a default Hadoop Configuration executor-side
  * (Configuration isn't serializable): local/HDFS paths resolve from
  * defaults; object-store schemes needing session-specific conf keys
  * would pass them through the partition as a string map. */
class GraftPartitionReader(p: GraftFilePartition)
  extends PartitionReader[InternalRow] {

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val fs = new Path(p.file).getFileSystem(conf)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(p.file)), "UTF-8"))
  in.readLine() // header

  // Filter-referenced columns convert FIRST (they may not be projected
  // at all once a pushed filter's column is pruned); projected columns
  // convert only for rows that survive, so a selective pushed filter
  // skips most of the parse work — the pushdown's payoff.
  private val filterRefs: Array[String] =
    p.filters.flatMap(_.references).distinct
  private val evalFields: Array[(Int, String => Any)] =
    filterRefs.map { n =>
      val f = p.full.fields.find(_.name == n).get
      (p.full.fieldIndex(n), converter(f))
    }
  private val evalPos: Map[String, Int] = filterRefs.zipWithIndex.toMap

  // required field -> Left(position among evalFields: value already
  // converted for the filter) or Right(token position, converter)
  private val fields: Array[Either[Int, (Int, String => Any)]] =
    p.required.fields.map { f =>
      evalPos.get(f.name).map(i => Left(i): Either[Int, (Int, String => Any)])
        .getOrElse(Right((p.full.fieldIndex(f.name), converter(f))))
    }

  private def tsUnit(f: StructField): ScalarParse.TsUnit =
    if (f.metadata.contains("graft.timestampUnit"))
      f.metadata.getString("graft.timestampUnit") match {
        case "TsSecond" => ScalarParse.TsSecond
        case "TsMicro" => ScalarParse.TsMicro
        case "TsNano" => ScalarParse.TsNano
        case _ => ScalarParse.TsMilli
      }
    else ScalarParse.TsMilli

  private def converter(f: StructField): String => Any = {
    val unsigned = f.metadata.contains("graft.unsigned") &&
      f.metadata.getBoolean("graft.unsigned")
    f.dataType match {
      case BooleanType => v => ScalarParse.parseBool(v).map(Boolean.box).orNull
      case LongType => v =>
        ScalarParse.parseI128(v)
          .filter(x => x.isValidLong && (!unsigned || x >= 0))
          .map(x => Long.box(x.toLong)).orNull
      case d: DecimalType => v =>
        ScalarParse.parseI128(v)
          .filter(x => x >= 0 && x <= BigInt("18446744073709551615"))
          .map(x => Decimal(BigDecimal(x), d.precision, d.scale)).orNull
      case DoubleType => v =>
        // cast-kernel parity: non-finite converts to null
        ScalarParse.parseF64(v).filter(d => !d.isNaN && !d.isInfinite)
          .map(Double.box).orNull
      case DateType => v =>
        ScalarParse.parseDateYmd(v).map(Int.box).orNull
      case TimestampNTZType =>
        val unit = tsUnit(f)
        v => ScalarParse.parseTimestampMs(v).map { ms =>
          val unitMs = unit match {
            // Scala Long `/` truncates toward zero, same as the
            // reference's Rust `ms / 1_000` (analyse.rs s-unit) and
            // CastKernel's `ms - ms % 1000`.
            case ScalarParse.TsSecond => (ms / 1000L) * 1000L
            case _ => ms
          }
          Long.box(unitMs * 1000L) // µs storage
        }.orNull
      case _ => v => UTF8String.fromString(v)
    }
  }

  private var current: InternalRow = _
  private var emitted: Long = 0L

  private def convertToken(tokens: Array[String], idx: Int,
                           conv: String => Any): Any = {
    val v = if (idx < tokens.length) tokens(idx) else null
    if (v == null || ScalarParse.isNullText(v)) null else conv(v)
  }

  // count(*)-style scans (no projected columns, no filters) need only
  // the LINE, never its fields — skip the quote-aware split entirely
  private val needsTokens = fields.nonEmpty || evalFields.nonEmpty

  override def next(): Boolean = {
    // pushed limit: stop reading the file once this partition has
    // produced enough surviving rows (Spark's global limit sits above)
    if (p.limit >= 0 && emitted >= p.limit) { current = null; return false }
    while (true) {
      val raw = in.readLine()
      if (raw == null) { current = null; return false }
      if (!needsTokens) {
        current = GraftPartitionReader.emptyRow; emitted += 1; return true
      }
      // readLine strips \n but keeps a CRLF file's \r — drop it, like
      // the reference's csv reader (and Spark's CSV source) do
      val line = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val tokens = GraftPartitionReader.splitFields(line, p.delim)
      val evalVals = new Array[Any](evalFields.length)
      var i = 0
      while (i < evalFields.length) {
        val (idx, conv) = evalFields(i)
        evalVals(i) = convertToken(tokens, idx, conv)
        i += 1
      }
      val pass = p.filters.forall(f =>
        GraftFilterEval.eval(f, p.full, n => evalVals(evalPos(n))).contains(true))
      if (pass) {
        val row = new GenericInternalRow(fields.length)
        var j = 0
        while (j < fields.length) {
          row.update(j, fields(j) match {
            case Left(ei) => evalVals(ei)
            case Right((idx, conv)) => convertToken(tokens, idx, conv)
          })
          j += 1
        }
        current = row
        emitted += 1
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

object GraftPartitionReader {
  /** Shared zero-column row for count-only scans. */
  val emptyRow: InternalRow = new GenericInternalRow(0)

  /** RFC-4180-style field split: fields optionally double-quoted, `""`
    * escapes a quote inside a quoted field — the same single-LINE
    * grammar the reference's csv crate applies per block line (embedded
    * newlines are out of scope there too; conversion.rs feeds it line
    * blocks). Unquoted fields pass through verbatim. */
  def splitFields(line: String, delim: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else if (c == '"' && cur.length() == 0) inQuotes = true
      else if (c == delim) { out += cur.toString; cur.setLength(0) }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toArray
  }
}
