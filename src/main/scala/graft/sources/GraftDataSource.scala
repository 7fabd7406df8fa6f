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
    extends ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {

    private var required: StructType = full

    override def pruneColumns(requiredSchema: StructType): Unit =
      // preserve our field metadata (ts unit / unsigned): prune by name
      required = StructType(requiredSchema.fieldNames.flatMap(n =>
        full.fields.find(_.name == n)))

    override def build(): Scan = this
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String = s"graft $path sep='$delim'"

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
      files.map(f => GraftFilePartition(f, full, required, delim): InputPartition)
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
  * positions), the pruned schema to emit, and the delimiter. */
case class GraftFilePartition(file: String, full: StructType,
                              required: StructType, delim: Char)
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

  // required field -> (position in the full token array, converter)
  private val fields: Array[(Int, String => Any)] =
    p.required.fields.map { f =>
      val idx = p.full.fieldIndex(f.name)
      (idx, converter(f))
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

  override def next(): Boolean = {
    val raw = in.readLine()
    if (raw == null) { current = null; false }
    else {
      // readLine strips \n but keeps a CRLF file's \r — drop it, like
      // the reference's csv reader (and Spark's CSV source) do
      val line = if (raw.nonEmpty && raw.last == '\r') raw.dropRight(1) else raw
      val tokens = GraftPartitionReader.splitFields(line, p.delim)
      val row = new GenericInternalRow(fields.length)
      var i = 0
      while (i < fields.length) {
        val (idx, conv) = fields(i)
        val v = if (idx < tokens.length) tokens(idx) else null
        row.update(i,
          if (v == null || ScalarParse.isNullText(v)) null else conv(v))
        i += 1
      }
      current = row
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

object GraftPartitionReader {
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
