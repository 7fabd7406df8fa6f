package graft.ingest

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines ingest through the SAME inference ladder and cast kernels
  * as the delimited-text pipeline — the modern "tabular" a training-data
  * pipeline actually receives. The reference converts only delimited
  * text (/root/reference/src/conversion.rs); this extends its contract
  * to NDJSON with unchanged typing semantics:
  *
  *  - key discovery replaces the header row: the column set and order
  *    come from the first-seen order of top-level keys across a bounded
  *    sample of lines (the reference's header read is the 1-line
  *    degenerate case of this);
  *  - every top-level value is captured as its RAW TOKEN TEXT into an
  *    all-string frame (numbers keep their literal spelling, nested
  *    objects/arrays keep their JSON text), so the type-decision ladder
  *    (O3–O5) and cast kernels (O11) apply verbatim — a `"123"` string
  *    and a `123` number land in the same Int64 column exactly as the
  *    reference's CSV cells would;
  *  - malformed lines null-pad instead of aborting (PERMISSIVE parity
  *    with the reference's analyse.rs:41-106 row handling);
  *  - missing keys are nulls, like the reference's short-row padding.
  *
  * Scale: the sample collect is bounded (1,000 lines, like
  * MAX_LIGNES_INFERENCE, schema.rs:11); the conversion itself is one
  * all-string scan (`text` source splits by maxPartitionBytes) + one
  * codegen'd `from_json` + cast projection — no shuffle anywhere, the
  * same no-shuffle shape as the CSV path.
  */
object JsonlIngest {

  /** Top-level keys of one JSON object line, in document order.
    * Malformed lines contribute no keys (they null-pad at read time). */
  private[ingest] def topLevelKeys(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val p = new JsonFactory().createParser(line)
      try {
        if (p.nextToken() == JsonToken.START_OBJECT) {
          var depth = 1
          var t = p.nextToken()
          while (t != null && depth > 0) {
            t match {
              case JsonToken.FIELD_NAME if depth == 1 =>
                val k = p.currentName()
                if (!out.contains(k)) out += k
              case JsonToken.START_OBJECT | JsonToken.START_ARRAY => depth += 1
              case JsonToken.END_OBJECT | JsonToken.END_ARRAY => depth -= 1
              case _ =>
            }
            t = if (depth > 0) p.nextToken() else null
          }
        }
      } finally p.close()
    } catch { case _: java.io.IOException => }
    out.toSeq
  }

  /** Key discovery over a bounded sample of lines: union of top-level
    * keys in first-seen order (first line's order wins for shared keys,
    * later lines append their novel keys) — the JSONL analogue of the
    * reference's header-row read. Driver-side by construction: the
    * sample is capped like the inference sample. */
  def discoverKeys(spark: SparkSession, path: String, sampleRows: Int = 1000): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    spark.read.text(path).limit(sampleRows).collect()
      .foreach(r => topLevelKeys(r.getString(0)).foreach(seen += _))
    require(seen.nonEmpty, s"no JSON object keys found in the first $sampleRows lines of $path")
    seen.toSeq
  }

  /** FULL key discovery — the `--inferer-schema-complet` analogue for
    * COLUMNS, not just types: keys that first appear past the sample
    * (or only in later files of a directory) join the schema. Order is
    * deterministic: the sampled first-seen keys keep their positions,
    * novel keys append ALPHABETICALLY (a distributed scan has no
    * meaningful "first seen"). The collect is bounded by the DISTINCT
    * top-level key count — a schema vocabulary, never row-scaled. */
  def discoverKeysFull(spark: SparkSession, path: String,
                       sampleRows: Int = 1000): Seq[String] = {
    val sampled = discoverKeys(spark, path, sampleRows)
    import spark.implicits._
    val all = spark.read.text(path).as[String]
      .mapPartitions(it => it.flatMap(topLevelKeys))
      .distinct().collect()
    sampled ++ (all.toSet -- sampled).toSeq.sorted
  }

  /** Raw all-string read: one `text` scan + `from_json` against an
    * all-string struct. Spark's Jackson parser captures non-string
    * tokens under a StringType field as their raw text (numbers and
    * booleans keep their literal spelling; nested objects/arrays their
    * JSON), which is exactly the "cell text" contract the ladder
    * expects. Malformed lines yield a null struct → all-null row. */
  def readRaw(spark: SparkSession, path: String, keys: Seq[String]): DataFrame = {
    val allString = StructType(keys.map(StructField(_, StringType, nullable = true)))
    spark.read.text(path)
      .select(from_json(col("value"), allString).as("j"))
      .select(keys.map(k => col("j").getField(k).as(k)): _*)
  }

  /** Full pipeline: JSONL file/directory → typed DataFrame, typing rules
    * identical to `IngestPipeline.convert`. `fullScan` widens BOTH
    * halves of inference, like the reference's flag: type decisions see
    * every line, and key discovery sees every line's keys. */
  def convert(spark: SparkSession, path: String, fullScan: Boolean = false,
              sampleRows: Int = 1000): DataFrame = {
    val keys =
      if (fullScan) discoverKeysFull(spark, path, sampleRows)
      else discoverKeys(spark, path, sampleRows)
    val raw = readRaw(spark, path, keys)
    IngestPipeline.applySchema(raw, IngestPipeline.inferSchema(raw, fullScan))
  }

  /** Content sniff for the CLI's format routing: the input is JSONL when
    * its first line parses as a JSON object with at least one key. One
    * buffered line read (the same bounded pre-pass as delimiter
    * detection — O2's shape, a format probe instead of a comma count);
    * directories probe their first data file. */
  def looksLikeJsonl(spark: SparkSession, path: String): Boolean = {
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = if (fs.getFileStatus(p0).isDirectory)
      fs.listStatus(p0)
        .filter(s => s.isFile && graft.sources.GraftDataSource.isDataFile(s.getPath.getName))
        .map(_.getPath).minBy(_.getName.toString)
    else p0
    val in = graft.sources.GraftPartitionReader.maybeDecompress(p.getName, fs.open(p))
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      val first = Option(reader.readLine()).getOrElse("")
      first.dropWhile(_.isWhitespace).startsWith("{") && topLevelKeys(first).nonEmpty
    } finally in.close()
  }

  /** Streaming form, mirroring `IngestPipeline.convertStream`: keys and
    * types pin ONCE from the files already present, then new files flow
    * through the same `from_json` + cast projection continuously. The
    * same RESTART CONTRACT applies — pass the first run's schema when
    * resuming from a checkpoint (see convertStream's scaladoc). */
  def convertStream(spark: SparkSession, path: String,
                    schema: Option[StructType] = None,
                    sampleRows: Int = 1000): DataFrame = {
    val pinned = schema.getOrElse {
      val keys = discoverKeys(spark, path, sampleRows)
      IngestPipeline.inferSchema(readRaw(spark, path, keys), fullScan = false)
    }
    val allString = StructType(pinned.fields.map(f =>
      StructField(f.name, StringType, nullable = true)))
    val rawStream = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType, nullable = true))))
      .text(path)
      .select(from_json(col("value"), allString).as("j"))
      .select(pinned.fieldNames.map(k => col("j").getField(k).as(k)).toSeq: _*)
    IngestPipeline.applySchema(rawStream, pinned)
  }
}
