package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject the native functions into SQL resolution") {
    // getOrCreate would return another spec's extension-less shared session —
    // clear the active/default handles so a NEW session (same context) is
    // built with the extensions, then restore for the other specs.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val sim = spark.sql(
        "SELECT graft_simhash64(array('the','quick','fox')) AS s").collect()(0).getLong(0)
      assert(sim !== 0L)
      val bucket = spark.sql(
        "SELECT graft_hyperplane_bucket(array(CAST(1.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)), 6) AS b")
        .collect()(0).getLong(0)
      assert(bucket >= 0L && bucket < (1L << 6))
      val types = spark.sql(
        "SELECT graft_type_set(v) AS t FROM VALUES ('1'), ('2.5'), ('x') AS t(v)")
        .collect()(0).getSeq[String](0)
      assert(types.toSet === Set("BOOL", "FLOAT64", "STRING"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
