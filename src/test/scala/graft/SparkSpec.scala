package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate dedups across
  * suites in the forked test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the library's deployment posture: native functions + CH-dialect
    // parser active for every suite, so a dialect-detection false
    // positive on plain Spark SQL would surface anywhere, not just in
    // the translator tests
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
}
