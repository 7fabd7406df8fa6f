package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** JSONL ingest through the shared ladder/kernels (JsonlIngest.scala):
  * key discovery, raw-token capture, missing-key padding, malformed-line
  * permissiveness, and type parity with the delimited path.
  */
class JsonlIngestSpec extends SparkSpec {

  private def tempJsonl(lines: String*): String = {
    val f = Files.createTempFile("graft_jsonl", ".jsonl")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    f.toString
  }

  test("key discovery: first-seen order, later lines append novel keys") {
    val p = tempJsonl(
      """{"b":1,"a":2}""",
      """{"a":3,"c":4}""",
      "not json",
      """{"b":5}""")
    assert(JsonlIngest.discoverKeys(spark, p) == Seq("b", "a", "c"))
  }

  test("number/bool tokens keep their literal spelling and re-type via the ladder") {
    val p = tempJsonl(
      """{"i":123,"f":4.5,"b":true,"s":"x"}""",
      """{"i":"456","f":6.25,"b":"false","s":"y"}""")
    val typed = JsonlIngest.convert(spark, p, fullScan = true)
    assert(typed.schema.map(_.dataType) ==
      Seq(LongType, DoubleType, BooleanType, StringType))
    val rows = typed.orderBy("i").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L, 456L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(4.5, 6.25))
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(true, false))
  }

  test("missing keys null-pad; JSON null is null; malformed line is all-null") {
    val p = tempJsonl(
      """{"a":"x","b":"y"}""",
      """{"a":"z"}""",
      """{"a":null,"b":"w"}""",
      """{{{""")
    val typed = JsonlIngest.convert(spark, p, fullScan = true)
    val rows = typed.collect()
    assert(rows.length == 4)
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
    assert(rows.count(r => r.isNullAt(0) && !r.isNullAt(1)) == 1)
    assert(rows.count(r => !r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("nested objects/arrays land as raw JSON text in a string column") {
    val p = tempJsonl(
      """{"id":1,"meta":{"k":1},"tags":[1,2]}""",
      """{"id":2,"meta":{"k":2},"tags":[]}""")
    val typed = JsonlIngest.convert(spark, p, fullScan = true)
    assert(typed.schema.map(_.dataType) == Seq(LongType, StringType, StringType))
    val r = typed.orderBy("id").collect()
    assert(r(0).getString(1) == """{"k":1}""")
    assert(r(0).getString(2) == "[1,2]")
    assert(r(1).getString(2) == "[]")
  }

  test("date/timestamp text re-types exactly like the delimited path") {
    val p = tempJsonl(
      """{"d":"2024-01-01","ts":"2024-01-01 10:30:00"}""",
      """{"d":"2024-01-02","ts":"2024-01-02 11:45:30"}""")
    val typed = JsonlIngest.convert(spark, p, fullScan = true)
    assert(typed.schema.map(_.dataType) == Seq(DateType, TimestampNTZType))
  }

  test("sampled key discovery is bounded; keys past the sample do not appear") {
    val head = (1 to 1000).map(i => s"""{"a":$i}""")
    val tail = Seq("""{"a":1001,"late":true}""")
    val p = tempJsonl((head ++ tail): _*)
    assert(JsonlIngest.discoverKeys(spark, p) == Seq("a"))
    // the late key is simply not a column, like a CSV row longer than
    // its header — extra cells drop in PERMISSIVE mode
    val typed = JsonlIngest.convert(spark, p, fullScan = true)
    assert(typed.columns.toSeq == Seq("a"))
    assert(typed.count() == 1001)
  }
}
