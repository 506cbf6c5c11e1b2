package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{TextDedup, TrainingMix}

/** Stage-bisection probe for composite-query cost: times the REAL
  * component frames (the same functions the composite calls, so the
  * probe can't drift from the shipped pipeline) against the full
  * build. Used to attribute the round-4 projection-collapse regression
  * (DESIGN.md "Measured (round 4)"). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (_ <- 1 to 2) {
      t("near_dup_pairs")(TextDedup.nearDupPairs(spark, dir).count())
      t("dup_clusters")(TextDedup.dupClusters(spark, dir).count())
      t("corpus_v1")(TrainingMix.buildCorpus(spark, dir).count())
      t("emb_near_dup")(graft.operators.VectorOps.nearDupPairs(spark, dir).count())
      t("emb_dup_clusters")(graft.operators.VectorOps.dupClusters(spark, dir).count())
    }
    spark.stop()
  }
}
