package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** The SQL-text face of the custom expressions: a session built with
  * GraftExtensions can call them from spark.sql directly. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot and graft_minhash are callable from SQL via extensions") {
    // save the shared sessions other suites may have created; restore
    // them afterwards so suite order doesn't change their session state
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))," +
          " array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(dot === 11.0)
      // SQL-registered minhash equals the declarative formulation
      val row = spark.sql(
        """SELECT graft_minhash(array('a b c', 'b c d'), 3) AS m,
                  transform(sequence(0, 2), s -> array_min(transform(
                    array('a b c', 'b c d'),
                    x -> md5(concat(x, '#', cast(s as string)))))) AS ref""")
        .head()
      assert(row.getSeq[String](0) === row.getSeq[String](1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
