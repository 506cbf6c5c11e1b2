package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the harness parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's declarative "datasource" layer
  * (`kits/users/pg/datasources`, `*.datasource` files): every table has a declared
  * name + normalization applied at scan time, and all query code goes
  * through this one registry rather than ad-hoc `spark.read` calls — so
  * scan-level decisions (timestamp normalization, column pruning reaching
  * the parquet reader, future bucketing/layout) live in one place.
  *
  * Scale note: readers return *unmaterialized* DataFrames; Catalyst pushes
  * projections and filters from downstream operators into the parquet scan
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`). Nothing here
  * collects or caches — at 100 TB these are just scan definitions.
  */
object Tables {

  /** Raw parquet scan of a named table under `dir`. */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` — the CDC-shaped stream table (event_id, ts, user_id,
    * event_type, value, props).
    *
    * The files store `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; we read it as raw Long nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds — exactly what DuckDB does when it reads the same file
    * (ns → µs truncation toward zero for post-epoch values), so oracle
    * comparisons see identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(spark, dir, "events")
      // timestamp_ntz: wall-clock µs in the UTC session zone — the same
      // logical type DuckDB reads, so dumped parquet carries identical
      // (naive, µs) timestamps instead of tz-adjusted ones.
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = raw(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = raw(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = raw(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = raw(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = raw(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = raw(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = raw(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = raw(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = raw(spark, dir, "embeddings")
}
