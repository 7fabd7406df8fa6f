package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

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
  * Round-trip caveats (inherent to the reference grammar, not bugs in
  * the writer): string VALUES that collide with the reference null
  * grammar — "null", "none", "nan", "n/a", "na", the empty string, or
  * whitespace-only text — read back as SQL NULL, and quoting cannot
  * protect them (the reader normalizes null tokens AFTER unquoting,
  * exactly like the reference); Double.NaN renders as "NaN" which is
  * itself a null token; and timestamps render at the reference's
  * native millisecond precision, so sub-ms fractions truncate. Frames
  * that avoid those values (most tabular data) round-trip exactly.
  *
  * Scale: one output file per input partition, written executor-side
  * with no driver involvement and no shuffle; each task streams rows
  * through a fixed-size buffer (optionally gzip) and renames its
  * dot-prefixed temp file into place on task commit — the rename is
  * atomic per file, and uncommitted temps stay invisible to readers
  * (the reader's hidden-file rule skips dot files).
  *
  * Durability: file names embed the write's queryId
  * (part-NNNNN-<queryId>), like Spark's own file sources embed a job
  * UUID — names are unique ACROSS applications, so a later append can
  * never regenerate (and the commit-time rename never replace) a file
  * a previous application committed. Overwrite (truncate) defers the
  * deletion of prior data files to BatchWrite.commit(): a write job
  * that fails leaves the previous dataset intact; only after every
  * task has committed are the old files (identified against the
  * committed-file list) removed. Driver-side commit/abort also sweep
  * any `.part-*-<queryId>*.inprogress` temps this write's dead
  * executors left behind. All filesystem access goes through the
  * session's Hadoop configuration (serialized to tasks), so
  * `spark.hadoop.*` settings — object-store credentials, custom
  * filesystems — apply to the write.
  *
  * Types: exactly the reader's surface (bool / i64 / u64-decimal / f64
  * / date / ms-or-s-unit timestamp / string). Doubles render via
  * shortest-round-trip Java formatting (reparses bit-equal); timestamps
  * render at millisecond precision — the reference's native unit.
  */
class GraftWriteBuilder(path: String, sep: Char, schema: StructType,
                        gzip: Boolean, stripNewlines: Boolean,
                        queryId: String, jsonlOut: Boolean = false)
  extends WriteBuilder with SupportsTruncate {

  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(
      path, sep, schema, gzip, stripNewlines, truncateOnCommit, queryId,
      jsonlOut)
  }
}

private class GraftBatchWrite(path: String, sep: Char, schema: StructType,
                              gzip: Boolean, stripNewlines: Boolean,
                              truncate: Boolean, queryId: String,
                              jsonlOut: Boolean = false)
  extends BatchWrite {

  GraftWriter.validateSchema(schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side, before any task runs: create the directory. Prior
    // data files are NOT deleted here even in truncate mode — the
    // delete is deferred to commit() so a failed job leaves the
    // previous dataset intact (delete-then-write would leave an EMPTY
    // directory behind a failed overwrite).
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    val dir = new Path(path)
    dir.getFileSystem(conf.value).mkdirs(dir)
    new GraftWriterFactory(path, sep, schema, gzip, stripNewlines, queryId,
      conf, jsonlOut)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    if (truncate) {
      // every task committed: replace the old dataset now. The new
      // files are identified by the commit messages (their names also
      // carry this write's queryId); everything else that looks like
      // data goes.
      val committed = messages.collect {
        case GraftCommitMessage(f) => new Path(f).getName
      }.toSet
      fs.listStatus(dir)
        .filter(s => s.isFile && GraftDataSource.isDataFile(s.getPath.getName) &&
          !committed(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    }
    GraftWriter.sweepTemps(fs, dir, queryId)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // tasks that died without running abort() left dot-temps behind;
    // they carry this write's queryId, so they are safe to remove
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    GraftWriter.sweepTemps(fs, dir, queryId)
  }
}

private case class GraftCommitMessage(file: String) extends WriterCommitMessage

private class GraftWriterFactory(path: String, sep: Char, schema: StructType,
                                 gzip: Boolean, stripNewlines: Boolean,
                                 queryId: String, conf: SerializableConfiguration,
                                 jsonlOut: Boolean = false)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, sep, schema, gzip, stripNewlines,
      partitionId, taskId, queryId, conf, jsonlOut)
}

private class GraftDataWriter(path: String, sep: Char, schema: StructType,
                              gzip: Boolean, stripNewlines: Boolean,
                              partitionId: Int, taskId: Long,
                              queryId: String, conf: SerializableConfiguration,
                              jsonlOut: Boolean = false)
  extends DataWriter[InternalRow] {

  private val ext =
    (if (jsonlOut) ".jsonl"
    else sep match { case '\t' => ".tsv"; case ',' => ".csv"; case _ => ".txt" }) +
      (if (gzip) ".gz" else "")
  // queryId (not taskId) makes the name unique across applications;
  // every attempt of this partition renames to the SAME final name,
  // and Spark's commit coordinator admits one attempt's commit
  private val finalName = f"part-$partitionId%05d-$queryId$ext"
  // dot prefix: invisible to the reader until the commit-time rename.
  // taskId keeps CONCURRENT attempts (speculation, zombie retries) of
  // one partition on separate temp files.
  private val tempPath = new Path(path, s".part-$partitionId%05d-$queryId-$taskId$ext.inprogress")
  private val fs = tempPath.getFileSystem(conf.value)
  private val out = {
    val raw = fs.create(tempPath, true)
    val s: java.io.OutputStream =
      if (gzip) new java.util.zip.GZIPOutputStream(raw, 1 << 16) else raw
    new BufferedWriter(new OutputStreamWriter(s, "UTF-8"), 1 << 16)
  }

  private val renderers: Array[InternalRow => String] =
    if (jsonlOut) Array.empty
    else schema.fields.zipWithIndex.map { case (f, i) =>
      GraftWriter.renderer(f, i, sep, stripNewlines)
    }
  private val jsonRenderers: Array[InternalRow => String] =
    if (jsonlOut) schema.fields.zipWithIndex.map { case (f, i) =>
      GraftWriter.jsonRenderer(f, i)
    } else Array.empty
  private val jsonKeys: Array[String] =
    if (jsonlOut) schema.fieldNames.map(GraftWriter.jsonEscape) else Array.empty

  // JSONL has no header line; key names travel on every object
  if (!jsonlOut) {
    out.write(schema.fieldNames.map(GraftWriter.quote(_, sep)).mkString(sep.toString))
    out.write("\n")
  }

  override def write(row: InternalRow): Unit = {
    if (jsonlOut) {
      // null fields are OMITTED (the reader's missing-key null padding
      // makes omission and explicit null indistinguishable on re-read)
      out.write("{")
      var i = 0
      var first = true
      while (i < jsonRenderers.length) {
        if (!row.isNullAt(i)) {
          if (!first) out.write(",")
          out.write("\"")
          out.write(jsonKeys(i))
          out.write("\":")
          out.write(jsonRenderers(i)(row))
          first = false
        }
        i += 1
      }
      out.write("}\n")
      return
    }
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
    // dest can only be a leftover of THIS write (the name carries our
    // queryId): a prior attempt that renamed but died before reporting.
    // Files of other applications have other queryIds and are never hit.
    fs.delete(dest, false)
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

  /** Remove in-progress temps belonging to `queryId`'s write — run by
    * the driver at commit/abort, where a task that died without
    * abort() (executor loss) can no longer clean up after itself. The
    * queryId scoping means a concurrent write's live temps are never
    * touched. */
  private[sources] def sweepTemps(fs: FileSystem, dir: Path, queryId: String): Unit =
    fs.listStatus(dir)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && n.startsWith(".part-") && n.contains(s"-$queryId") &&
          n.endsWith(".inprogress")
      }
      .foreach(s => fs.delete(s.getPath, false))

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
    * back to null). String values that EQUAL a null token read back as
    * null — see the class scaladoc; quoting cannot protect them
    * because null-normalization runs after unquoting (reference
    * parity).
    *
    * Embedded line terminators in string values are unrepresentable in
    * a line-oriented format (quoting does not help: the reader's
    * readLine splits on \r or \n BEFORE the quote grammar runs — the
    * same reason the reference's line-block pipeline can't carry
    * them). `stripNewlines=false` (default) fails fast with the column
    * name; true replaces runs of [\r\n] with one space — explicitly
    * lossy, for corpora where documents legitimately contain
    * newlines. */
  /** Minimal JSON string escape: quote, backslash, and control chars.
    * Everything else (including newlines-free multi-byte text) passes
    * through verbatim — and unlike the delimited form, EMBEDDED
    * NEWLINES are legal here, riding as \n escapes. */
  def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' =>
          sb.append("\\u").append(f"${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** JSONL value renderer: numbers and booleans as native JSON tokens,
    * dates/timestamps as the SAME text forms the delimited renderer
    * emits (quoted — the reader's ladder re-types them), strings
    * escaped. The caller skips null fields entirely. */
  def jsonRenderer(f: StructField, i: Int): InternalRow => String = {
    val delimited = renderer(f, i, ',', stripNewlines = false)
    f.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           DoubleType | _: DecimalType => r => rawNumberish(f, i, r)
      case FloatType => r => java.lang.Double.toString(r.getFloat(i).toDouble)
      case DateType | TimestampNTZType | TimestampType =>
        r => "\"" + delimited(r) + "\""
      case _ => r => "\"" + jsonEscape(r.getUTF8String(i).toString) + "\""
    }
  }

  private def rawNumberish(f: StructField, i: Int, r: InternalRow): String =
    f.dataType match {
      case BooleanType => if (r.getBoolean(i)) "true" else "false"
      case ByteType => java.lang.Byte.toString(r.getByte(i))
      case ShortType => java.lang.Short.toString(r.getShort(i))
      case IntegerType => java.lang.Integer.toString(r.getInt(i))
      case LongType => java.lang.Long.toString(r.getLong(i))
      case DoubleType =>
        val d = r.getDouble(i)
        // JSON has no NaN/Infinity tokens; render as the null-token
        // string the reader nulls anyway (delimited-path parity)
        if (d.isNaN || d.isInfinite) "\"" + java.lang.Double.toString(d) + "\""
        else java.lang.Double.toString(d)
      case d: DecimalType =>
        r.getDecimal(i, d.precision, d.scale).toBigDecimal.toBigInt.toString
      case _ => throw new IllegalStateException(f.dataType.toString)
    }

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
