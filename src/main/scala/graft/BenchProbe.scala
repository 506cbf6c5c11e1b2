package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{TextAnalysis, TextDedup}

/** Scratch stage-bisection for composite-query cost (not part of the
  * public surface; used to attribute time inside buildCorpusV2). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      val rep = TextAnalysis.repetitionFrame(spark, dir).select(col("doc_id"), col("keep"))
      val spans = TextDedup.spanDocStatsFrame(spark, dir).select(col("doc_id"), col("has_long_dup"))
      t("rep")(rep.count())
      t("spans")(spans.count())
      val quality = Tables.documents(spark, dir)
        .join(rep, "doc_id").filter(col("keep")).drop("keep")
        .join(spans, Seq("doc_id"), "left")
        .filter(col("has_long_dup").isNull || !col("has_long_dup"))
        .drop("has_long_dup")
      t("repKeep")(rep.filter(col("keep")).count())
      t("docsJoinRep")(Tables.documents(spark, dir)
        .join(rep, "doc_id").filter(col("keep")).count())
      t("quality")(quality.count())
      val exactCanon = quality
        .withColumn("__rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
        .filter(col("__rn") === 1).drop("__rn")
      t("canon")(exactCanon.count())
      t("full")(operators.TrainingMix.buildCorpusV2(spark, dir).count())
    }
    spark.stop()
  }
}
