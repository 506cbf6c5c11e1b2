package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality audit over the warehouse tables — the
  * constraint-suite pattern (null checks, key uniqueness, foreign-key
  * resolution, domain ranges) a pipeline runs before promoting a
  * batch. One row per check: what was checked, how many rows, how many
  * violations — all-zero violations is the PASS certificate, non-zero
  * is the incident report (this corpus genuinely fails two checks:
  * negative account balances and duplicated lineitem line numbers).
  *
  * Scale: every check is a single-scan aggregate (violations counted
  * map-side); FK checks join the fact against the broadcast key set of
  * the dimension — no check shuffles a fact table. The union of
  * one-row frames is driver-free plan glue.
  */
object Audit {

  private def constraint(name: String, df: DataFrame, bad: Column): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))

  private def pkUnique(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    // distinct over a STRUCT of the keys, not countDistinct(k1, k2):
    // countDistinct drops any tuple containing a NULL, so a row with a
    // null key would be misreported as a duplicate (and disagree with
    // the oracle's row-tuple DISTINCT, which counts it) — on an audit
    // whose whole purpose is dirty data, NULL keys must count as
    // distinct values, exactly as SQL row-value DISTINCT does
    df.agg(count(lit(1)).as("n_checked"),
        countDistinct(struct(keys.map(col): _*)).as("__d"))
      .select(lit(name).as("check"), col("n_checked"),
        (col("n_checked") - col("__d")).as("n_violations"))

  private def fkResolves(name: String, fact: DataFrame, fk: String,
                         dim: DataFrame, pk: String): DataFrame =
    // the PK set scales with the dimension (customer/part/supplier all
    // grow with SF) — no broadcast hint; the planner/AQE broadcasts
    // while it fits and falls back to a shuffle join instead of an OOM
    fact.join(dim.select(col(pk).as("__k")).distinct(),
        col(fk) === col("__k"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))

  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val e = Tables.events(spark, dir)
    Seq(
      pkUnique("customer.pk_unique", c, Seq("c_custkey")),
      constraint("customer.acctbal_non_negative", c, col("c_acctbal") < 0),
      fkResolves("orders.fk_custkey_resolves", o, "o_custkey", c, "c_custkey"),
      constraint("orders.status_in_set", o,
        !col("o_orderstatus").isin("O", "F", "P")),
      pkUnique("lineitem.pk_unique", li, Seq("l_orderkey", "l_linenumber")),
      constraint("lineitem.qty_in_range", li,
        col("l_quantity") < 1 || col("l_quantity") > 50),
      fkResolves("lineitem.fk_orderkey_resolves", li, "l_orderkey", o, "o_orderkey"),
      constraint("events.value_present", e, col("value").isNull)
    ).reduce(_ unionByName _)
      .orderBy("check")
  }
}
