package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) multi-dimensional clustering: interleave the bits
  * of two key columns so that rows close in BOTH dimensions get close
  * Morton codes. Writing a table range-partitioned and sorted by the
  * Morton code gives every file a tight bounding box in (x, y) —
  * min/max column stats then prune file reads for predicates on EITHER
  * dimension, the layout trick behind multi-dimensional data skipping
  * in modern lakehouse engines.
  *
  * The bit interleave is the classic magic-mask spread — five
  * shift/mask steps per dimension, all plain integer ops that stay
  * inside whole-stage codegen (and are expressible identically in any
  * engine, which is how the DuckDB oracle checks it). 16 bits per
  * dimension → a 32-bit Morton code; at larger domains rescale keys
  * into 16-bit rank space first (the standard practice — Z-ordering
  * cares about relative order, not absolute values).
  */
object Zorder {

  /** Spread the low 16 bits of `x` to the even bit positions 0,2,…,30. */
  private def part1by1(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x on even bits, y on odd. */
  def morton2(x: Column, y: Column): Column =
    part1by1(x).bitwiseOR(shiftleft(part1by1(y), 1))

  /** Registered endpoint: the Z-order layout summary of `lineitem`
    * clustered on (l_partkey, l_suppkey) — per Z-bucket (top 10 Morton
    * bits) the row count, Morton range, and the bounding box in both
    * dimensions. The tight per-bucket boxes ARE the data-skipping
    * story: a filter on either part or supplier touches only the
    * buckets whose box intersects it.
    *
    * Scale: the Morton code is a pure projection; the summary is one
    * map-side-combined groupBy on the bucket key. The layout write
    * itself is [[clusteredWrite]]. */
  def lineitemZorder(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        morton2(col("l_partkey"), col("l_suppkey")).as("morton"))
      .withColumn("zbucket", shiftright(col("morton"), 22).cast("int"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("morton").as("morton_min"), max("morton").as("morton_max"),
        min("l_partkey").as("part_min"), max("l_partkey").as("part_max"),
        min("l_suppkey").as("supp_min"), max("l_suppkey").as("supp_max"))
      .orderBy("zbucket")

  /** Write `df` Z-order-clustered on (`xCol`, `yCol`): range-partition
    * by Morton code (contiguous code ranges per output file → disjoint
    * bounding boxes), sort within partitions (tight row-group stats
    * inside each file), drop the helper column. At 100 TB this is the
    * one-time layout investment that turns every subsequent
    * two-dimensional selective scan into a handful of file reads. */
  def clusteredWrite(df: DataFrame, xCol: String, yCol: String,
                     path: String, numFiles: Int): Unit =
    df.withColumn("__z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
