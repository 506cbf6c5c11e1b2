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
    * The harness has shipped `ts` in two physical encodings across
    * regenerations: parquet TIMESTAMP(NANOS) read as a raw Long (older
    * data), and plain TIMESTAMP_MICROS with isAdjustedToUTC=false, which
    * Spark scans as `timestamp_ntz` (current data). Branch on the actual
    * scanned dtype so a future regen can't silently break every events
    * reader again: either way downstream sees wall-clock µs `timestamp_ntz`
    * — the same logical instants DuckDB reads from the same file, so
    * oracle comparisons match. (Do NOT rely on
    * `spark.sql.legacy.parquet.nanosAsLong` — inert on Spark 4.1.2 when
    * set post-launch; the LongType branch only fires if the harness ever
    * writes int64 nanos again.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = raw(spark, dir, "events")
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case TimestampNTZType => df
      case TimestampType    => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case LongType =>
        // int64 nanos → truncate toward zero to µs (DuckDB's read behavior)
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — update Tables.events for the new testdata encoding")
    }
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
