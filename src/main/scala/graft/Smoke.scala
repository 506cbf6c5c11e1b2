package graft
import org.apache.spark.sql.SparkSession
object Smoke {
  def main(args: Array[String]): Unit = {
    // deliberately bare session — mimics the driver's own smoke harness
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    spark.stop()
  }
}
