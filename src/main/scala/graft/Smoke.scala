package graft
import org.apache.spark.sql.SparkSession
object Smoke {
  def main(args: Array[String]): Unit = {
    // near-bare session mimicking the driver's smoke harness; UTC pinned
    // because the engine's canonical time type is naive UTC wall-clock
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    spark.stop()
  }
}
