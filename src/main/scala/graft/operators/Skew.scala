package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4; AQE handles skewed *joins*
  * at runtime, but skewed *distinct-aggregation* state and pathological
  * key distributions still need explicit salting at 100 TB).
  *
  * Both helpers are pure plan rewrites — results are provably identical
  * to the unsalted operator (SkewSpec asserts it), only the shuffle key
  * space changes.
  */
object Skew {

  /** count(DISTINCT valueCol) per key without concentrating any key's
    * distinct-set on one task: stage 1 computes per-(key, salt) partial
    * distincts where salt = hash(value) % buckets — every duplicate
    * value lands in the same bucket, so bucket-distincts partition the
    * global distinct set and stage 2 just sums them. State per task
    * shrinks by `buckets`×; the hot key's work spreads over `buckets`
    * tasks. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[Column], valueCol: Column,
                          buckets: Int, as: String): DataFrame = {
    val partial = df
      .groupBy(keys :+ pmod(hash(valueCol), lit(buckets)).as("__salt"): _*)
      .agg(countDistinct(valueCol).as("__partial"))
    partial.groupBy(keys: _*)
      .agg(sum(col("__partial")).as(as))
  }

  /** Salted equi-join for a skewed left side: the right side is
    * replicated `buckets` times (one copy per salt), the left side gets
    * a deterministic salt from a unique column, and the join key becomes
    * (key, salt) — a hot key's rows spread over `buckets` tasks instead
    * of one. Use when the build side is too big to broadcast but small
    * enough to replicate; otherwise let AQE split skewed partitions. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftUniqueCol: Column, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(hash(leftUniqueCol), lit(buckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
