package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed point-in-time ("as-of") join: for every left row, the
  * payload of the LATEST right row with the same key and right.ts <=
  * left.ts — the CDC enrichment primitive (attach the dimension state
  * that was current when the event happened), and the operator family
  * ClickHouse ships as `ASOF JOIN`.
  *
  * Shape: NOT a join. Both sides union into one stream, one shuffle on
  * the key, and a running `last(payload ignoreNulls)` window ordered by
  * (ts, side) — right rows sort before left rows at equal ts, so the
  * match is inclusive. Cost is a single exchange of |L|+|R| rows and a
  * linear in-partition sweep: no range-join explosion, no per-key
  * driver loop, no broadcast requirement on either side. This is the
  * canonical 100 TB as-of shape (a range join would rescan the right
  * timeline per left row; a windowed merge reads both once).
  */
object AsOfJoin {

  /** Generic as-of join. `right` must contain `keys :+ tsCol :+
    * rightPayload` and be UNIQUE per (keys, tsCol) — pre-aggregate
    * multiple versions at one instant first (the registered query picks
    * max event_id), or the match among simultaneous right rows is
    * nondeterministic. Payload columns may hold nulls: they ride inside
    * one struct, so a null FIELD never falls through to an older right
    * row (only "no right row yet" yields null). Output = left columns +
    * payload columns. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightPayload: Seq[String]): DataFrame = {
    val r2 = right.select(
        (keys :+ tsCol).map(col) :+ struct(rightPayload.map(col): _*).as("__asof"): _*)
      .withColumn("__side", lit(0))
    val l2 = left.withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Registered instance: last-click attribution — every purchase event
    * enriched with the user's most recent click at-or-before the
    * purchase instant (the right side deduplicated to one click per
    * (user, instant) by max event_id), plus the attribution gap in
    * microseconds. Purchases before any click keep null attribution. */
  def eventsAsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_event_id"))
      .withColumn("click_ts", col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    asOfJoin(purchases, clicks, Seq("user_id"), "ts",
        Seq("click_event_id", "click_ts"))
      .withColumn("gap_us",
        graft.functions.ChFunctions.ntzMicros(col("ts")) -
          graft.functions.ChFunctions.ntzMicros(col("click_ts")))
      .orderBy("event_id")
  }
}
