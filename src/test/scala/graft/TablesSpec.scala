package graft

import org.apache.spark.sql.types._

/** Pins the LOADER CONTRACT: whatever physical encoding the staged
  * parquet uses, Tables must present each table to query code with the
  * canonical column set and dtypes below. Round 10 demonstrated why
  * this must fail in ONE place with a clear message: the driver
  * re-staged `events.ts` from ns-BIGINT to timestamp[us] and 20
  * queries + 16 tests went red deep inside operator code. A drift now
  * lands here first, naming the loader to fix.
  */
class TablesSpec extends SparkSpec {

  private def fieldTypes(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events presents the normalized contract on every staged sf") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val t = fieldTypes(Tables.events(spark, dir))
      assert(t("ts") == LongType,
        s"$dir: events.ts must normalize to epoch-ns LongType, got ${t("ts")}")
      assert(t("ts_ts") == TimestampType,
        s"$dir: events.ts_ts must be TimestampType, got ${t("ts_ts")}")
      assert(t("event_id") == LongType && t("user_id") == LongType)
      assert(t("event_type") == StringType && t("props") == StringType)
      assert(t("value") == DoubleType)
    }
  }

  test("events ns longs agree with the timestamp column to the microsecond") {
    import org.apache.spark.sql.functions._
    // whichever physical path loaded the table, the two exposed forms
    // must describe the same instants (ns is µs-exact by contract)
    val bad = Tables.events(spark, sf)
      .filter(expr("ts div 1000") =!= unix_micros(col("ts_ts")))
      .count()
    assert(bad == 0, s"$bad rows where ts (ns) and ts_ts disagree")
  }

  test("TPC-H-ish tables keep their canonical dtypes") {
    // date columns have shipped as both DATE and timestamp[us]; query
    // code tolerates any date-like encoding (casts on use), so the
    // contract is membership, not one physical type
    val dateLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    val li = fieldTypes(Tables.lineitem(spark, sf))
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType
      && dateLike(li("l_shipdate")),
      s"lineitem drifted: $li")
    val o = fieldTypes(Tables.orders(spark, sf))
    assert(o("o_orderkey") == LongType && dateLike(o("o_orderdate"))
      && o("o_totalprice") == DoubleType, s"orders drifted: $o")
    val c = fieldTypes(Tables.customer(spark, sf))
    assert(c("c_custkey") == LongType, s"customer drifted: $c")
  }

  test("documents and embeddings keep their canonical dtypes") {
    val d = fieldTypes(Tables.documents(spark, sf))
    assert(d("doc_id") == LongType && d("text") == StringType,
      s"documents drifted: $d")
    val e = fieldTypes(Tables.embeddings(spark, sf))
    assert(e("vec_id") == LongType, s"embeddings drifted: $e")
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${e("embedding")}")
  }
}
