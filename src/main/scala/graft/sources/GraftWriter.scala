package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Batch write support for the `graft` source: typed rows → delimited
  * text with a header line, quoted per the same single-line RFC-4180
  * grammar the reader splits with — so
  * `df.write.format("graft").save(dir)` followed by
  * `spark.read.format("graft").load(dir)` round-trips the frame. The
  * reference pipeline converts tabular → parquet; this is the missing
  * inverse for interchange with line-oriented consumers, reusing the
  * reference's value grammar (empty string = null, `true`/`false`
  * bools, ISO dates, ms-precision timestamps) so the reference's OWN
  * converter re-ingests the output losslessly.
  *
  * Scale: one output file per input partition, written executor-side
  * with no driver involvement and no shuffle; each task streams rows
  * through a fixed-size buffer (optionally gzip) and renames its
  * dot-prefixed temp file into place on task commit — the rename is
  * atomic per file, and uncommitted temps stay invisible to readers
  * (the reader's hidden-file rule skips dot files). Overwrite mode
  * deletes prior DATA files only (markers/sidecars untouched) on the
  * driver before tasks launch.
  *
  * Types: exactly the reader's surface (bool / i64 / u64-decimal / f64
  * / date / ms-or-s-unit timestamp / string). Doubles render via
  * shortest-round-trip Java formatting (reparses bit-equal); timestamps
  * render at millisecond precision — the reference's native unit.
  */
class GraftWriteBuilder(path: String, sep: Char, schema: StructType,
                        gzip: Boolean, stripNewlines: Boolean)
  extends WriteBuilder with SupportsTruncate {

  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(
      path, sep, schema, gzip, stripNewlines, truncateOnCommit)
  }
}

private class GraftBatchWrite(path: String, sep: Char, schema: StructType,
                              gzip: Boolean, stripNewlines: Boolean,
                              truncate: Boolean)
  extends BatchWrite {

  GraftWriter.validateSchema(schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side, before any task runs: create the directory; in
    // truncate (overwrite) mode drop prior data files — hidden files
    // (markers, in-flight temps of OTHER queries) are left alone.
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncate) {
      fs.listStatus(dir)
        .filter(s => s.isFile && GraftDataSource.isDataFile(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    new GraftWriterFactory(path, sep, schema, gzip, stripNewlines)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class GraftCommitMessage(file: String) extends WriterCommitMessage

private class GraftWriterFactory(path: String, sep: Char, schema: StructType,
                                 gzip: Boolean, stripNewlines: Boolean)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, sep, schema, gzip, stripNewlines, partitionId, taskId)
}

private class GraftDataWriter(path: String, sep: Char, schema: StructType,
                              gzip: Boolean, stripNewlines: Boolean,
                              partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val ext =
    (sep match { case '\t' => ".tsv"; case ',' => ".csv"; case _ => ".txt" }) +
      (if (gzip) ".gz" else "")
  private val finalName = f"part-$partitionId%05d-$taskId$ext"
  // dot prefix: invisible to the reader until the commit-time rename
  private val tempPath = new Path(path, s".$finalName.inprogress")
  private val conf = new org.apache.hadoop.conf.Configuration()
  private val fs = tempPath.getFileSystem(conf)
  private val out = {
    val raw = fs.create(tempPath, true)
    val s: java.io.OutputStream =
      if (gzip) new java.util.zip.GZIPOutputStream(raw, 1 << 16) else raw
    new BufferedWriter(new OutputStreamWriter(s, "UTF-8"), 1 << 16)
  }

  private val renderers: Array[InternalRow => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      GraftWriter.renderer(f, i, sep, stripNewlines)
    }

  out.write(schema.fieldNames.map(GraftWriter.quote(_, sep)).mkString(sep.toString))
  out.write("\n")

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < renderers.length) {
      if (i > 0) out.write(sep.toInt)
      out.write(renderers(i)(row))
      i += 1
    }
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = new Path(path, finalName)
    fs.delete(dest, false) // task retry may have left a half-renamed file
    if (!fs.rename(tempPath, dest))
      throw new java.io.IOException(s"graft writer: rename to $dest failed")
    GraftCommitMessage(dest.toString)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(tempPath, false)
  }

  override def close(): Unit = ()
}

object GraftWriter {
  private val dateFmt = DateTimeFormatter.ISO_LOCAL_DATE
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  def validateSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | DateType | TimestampNTZType |
             TimestampType | StringType => ()
        case d: DecimalType if d.scale == 0 => () // u64 columns
        case other => throw new IllegalArgumentException(
          s"graft writer: column '${f.name}' has unsupported type $other " +
            "(supported: boolean, integral, u64 decimal, float/double, " +
            "date, timestamp, string)")
      }
    }

  /** Quote a rendered field iff it contains the delimiter or a quote
    * (the reader's line grammar: `""` escapes a quote). Line
    * terminators are NOT quotable — the line-oriented reader splits on
    * any of \r, \n before the quote grammar ever sees the field — so
    * they are handled (error or strip) before this point. */
  def quote(v: String, sep: Char): String =
    if (v.indexOf(sep) >= 0 || v.indexOf('"') >= 0)
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** Per-field renderer from Catalyst internal values to the reference
    * value grammar, quoted against the live separator. Null → empty
    * field (the reference's primary null token, which the reader maps
    * back to null).
    *
    * Embedded line terminators in string values are unrepresentable in
    * a line-oriented format (quoting does not help: the reader's
    * readLine splits on \r or \n BEFORE the quote grammar runs — the
    * same reason the reference's line-block pipeline can't carry
    * them). `stripNewlines=false` (default) fails fast with the column
    * name; true replaces runs of [\r\n] with one space — explicitly
    * lossy, for corpora where documents legitimately contain
    * newlines. */
  def renderer(f: StructField, i: Int, sep: Char,
               stripNewlines: Boolean): InternalRow => String = {
    // narrower Spark types render widened (the reference grammar has
    // only i64/f64): a read-back sees equal VALUES at the wider type
    val render: InternalRow => String = f.dataType match {
      case BooleanType => r => if (r.getBoolean(i)) "true" else "false"
      case ByteType => r => java.lang.Byte.toString(r.getByte(i))
      case ShortType => r => java.lang.Short.toString(r.getShort(i))
      case IntegerType => r => java.lang.Integer.toString(r.getInt(i))
      case LongType => r => java.lang.Long.toString(r.getLong(i))
      case d: DecimalType => r =>
        r.getDecimal(i, d.precision, d.scale).toBigDecimal.toBigInt.toString
      // float widens BEFORE rendering: Double.toString(f.toDouble)
      // reparses to exactly the widened double (Float.toString would
      // not — its shortest repr reparses to a DIFFERENT double)
      case FloatType => r => java.lang.Double.toString(r.getFloat(i).toDouble)
      case DoubleType => r => java.lang.Double.toString(r.getDouble(i))
      case DateType => r => LocalDate.ofEpochDay(r.getInt(i)).format(dateFmt)
      // µs storage → ms render (the reference's native unit; its
      // schemas only ever carry ms- or s-unit timestamps). An instant
      // (TimestampType) renders as its UTC wall time — the reference
      // grammar is zoneless, and graft sessions pin UTC.
      case TimestampNTZType | TimestampType => r =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(r.getLong(i), 1000000L),
          (Math.floorMod(r.getLong(i), 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).format(tsFmt)
      case _ => r => {
        val s = r.getUTF8String(i).toString
        if (s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
        else if (stripNewlines) s.replaceAll("[\r\n]+", " ")
        else throw new IllegalArgumentException(
          s"graft writer: column '${f.name}' contains a line terminator, " +
            "which a line-oriented format cannot carry; write with " +
            "option(\"newline\", \"strip\") to replace runs of CR/LF " +
            "with a space (lossy), or clean the column first")
      }
    }
    r => if (r.isNullAt(i)) "" else quote(render(r), sep)
  }
}
