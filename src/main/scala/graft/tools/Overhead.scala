package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 measurement probe: where does a SUB-SECOND query's bench
  * figure actually go at sf0.1? The r15 bench put 79 of 104.5 s in the
  * 160 sub-second queries (~0.5 s each), so "optimize the top row"
  * stops paying long before the total moves — this tool decomposes a
  * query's cold cost into
  *
  *   construct — the Scala call building the DataFrame (plus any
  *               currency probes / fixture checks it runs),
  *   plan      — analysis + optimization + physical planning + AQE
  *               prep (`queryExecution.executedPlan` forced),
  *   execute   — the count() action (includes per-stage codegen
  *               compilation, scan setup, task scheduling, compute).
  *
  * Usage: runMain graft.tools.Overhead <sfDir> <q1> [q2 ...]
  * Same session shape as Bench so figures are comparable. Each query
  * is measured cold-in-session, then a second full pass reports the
  * warm figure (codegen cache hits, JIT) — the delta between passes is
  * the per-query compilation overhead the bench's cold convention
  * charges every sub-second query.
  */
object Overhead {
  def main(args: Array[String]): Unit = {
    graft.RunLock.acquireOrDie("Overhead")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    for (pass <- Seq("cold", "warm"); name <- names) {
      graft.Bench.quiesce()
      val (tc, df) = t(graft.SparkEntry.queries(name)(spark, sfDir))
      val (tp, _) = t(df.queryExecution.executedPlan)
      val (te, n) = t(df.count())
      println(f"[overhead] $pass $name%-34s construct=$tc%6.3f plan=$tp%6.3f " +
        f"execute=$te%6.3f total=${tc + tp + te}%6.3f rows=$n")
    }
    spark.stop()
  }
}
