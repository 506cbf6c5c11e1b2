package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.pipes.CdcPipes

/** The signature capability (SURVEY §2.4): all three latest-state
  * strategies must agree, and the result must be invariant to event
  * arrival order and duplicate delivery (§2.9 at-least-once tolerance). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: Seq[(Long, Long, String)]) =
    rows.toDF("id", "ver", "payload")

  private val base = Seq[(Long, Long, String)](
    (1L, 10L, "a"), (1L, 30L, "c"), (1L, 20L, "b"),
    (2L, 5L, "x"), (3L, 7L, "y"), (3L, 7L, "y"))

  private def latest(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.select("id", "ver", "payload").as[(Long, Long, String)].collect().toSet

  private val expected = Set((1L, 30L, "c"), (2L, 5L, "x"), (3L, 7L, "y"))

  test("D1 window dedup keeps newest per key") {
    val d1 = Dedup.latestByWindow(log(base), Seq(col("id")), Seq(col("ver")))
    assert(latest(d1) == expected)
  }

  test("D2 argMax dedup equals D1") {
    val d2 = Dedup.latestByKey(log(base), Seq("id"), col("ver"), Seq("ver", "payload"))
    assert(latest(d2) == expected)
  }

  test("D3 incremental snapshot equals D2 across a watermark split") {
    val l = log(base)
    val prior = Dedup.latestByKey(l.filter(col("ver") <= 10), Seq("id"),
      col("ver"), Seq("ver", "payload"))
    val d3 = Dedup.incrementalSnapshot(prior, l, Seq("id"), col("ver"), "ver",
      Seq("ver", "payload"), lit(10L))
    assert(latest(d3) == expected)
  }

  test("dedup is permutation-invariant and duplicate-idempotent") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val shuffled = rnd.shuffle(base ++ base) // duplicates + reorder
      val d2 = Dedup.latestByKey(log(shuffled), Seq("id"), col("ver"),
        Seq("ver", "payload"))
      assert(latest(d2) == expected)
    }
  }

  test("D1, D2, D3 agree on the real events table") {
    val d1 = CdcPipes.latestEventPerUser(spark, sf).collect().toSeq
    val d2 = CdcPipes.usersLatestRmt(spark, sf).collect().toSeq
    val d3 = CdcPipes.usersApiBatch(spark, sf).collect().toSeq
    assert(d1 == d2)
    assert(d2 == d3)
  }
}
