package graft

import org.apache.spark.sql.SparkSession

/** The cluster-deployment path for the SQL surface: a session built
  * with `spark.sql.extensions=graft.GraftSparkExtensions` has every
  * graft function available with no registration call — the idiomatic
  * spark-submit deployment of an engine extension.
  */
class GraftSparkExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions injects the graft functions into new sessions") {
    val orig = spark
    // a genuinely NEW session (same SparkContext) so the extensions
    // class runs at construction; getOrCreate would return `orig`
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions runs the SAME injection code spark-submit's
      // `--conf spark.sql.extensions=graft.GraftSparkExtensions` does;
      // the conf form is a static SQL conf, unusable on a test-shared
      // SparkContext (it must be set before the context starts)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftSparkExtensions())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // day-first reference parse through the injected function
      val d = s2.sql("SELECT graft_parse_date_ymd('02/01/1970') AS d")
        .collect().head.getDate(0)
      assert(d.toString == "1970-01-02", s"got $d")
      // an expression with literal knob args resolves too
      val n = s2.sql(
        "SELECT size(graft_word_ngrams('a b c d', 2)) AS n")
        .collect().head.getInt(0)
      assert(n == 3)
      // round-14 builders: the minhash band kernel (default knobs) and
      // the literal-matrix centroid assignment resolve through the
      // same injection
      val nb = s2.sql(
        "SELECT size(graft_minhash_bands(array('a b', 'b c'))) AS nb")
        .collect().head.getInt(0)
      assert(nb == 8, s"expected 8 band keys, got $nb")
      val c = s2.sql(
        "SELECT graft_argmax_dot(array(0.0d, 1.0d), " +
          "array(1.0d, 0.0d, 0.0d, 1.0d), 2) AS c")
        .collect().head.getInt(0)
      assert(c == 1, s"expected centroid 1, got $c")
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
