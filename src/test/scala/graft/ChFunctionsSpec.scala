package graft

import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._

/** Unit coverage of the ClickHouse-function shim (SURVEY §2.8) —
  * one place where every mapping decision is pinned. */
class ChFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).first().get(0)

  test("toYYYYMM") {
    assert(one(toYYYYMM(lit("2024-03-07 01:02:03").cast("timestamp"))) == 202403)
  }

  test("toStartOfMinute truncates and stays ntz") {
    val df = Seq("2024-03-07 01:02:33").toDF("s")
      .select(toStartOfMinute(col("s").cast("timestamp")).as("m"))
    assert(df.schema("m").dataType.typeName == "timestamp_ntz")
    assert(df.first().get(0).toString == "2024-03-07T01:02")
  }

  test("toFixedString pads and truncates") {
    assert(one(toFixedString(lit("ab"), 4)) == "ab  ")
    assert(one(toFixedString(lit("abcdef"), 4)) == "abcd")
  }

  test("nullIf / ifNull") {
    assert(one(nullIf(lit(5), lit(5))) == null)
    assert(one(ifNull(nullIf(lit(5), lit(5)), lit(9))) == 9)
  }

  test("exactSum is order-insensitive and exact on 2dp values") {
    val vals = Seq(0.1, 0.2, 0.3, 8.1, 185.22, 99.99)
    val a = vals.toDF("v").agg(exactSum(col("v"), 2).as("s")).first().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(3)
      .agg(exactSum(col("v"), 2).as("s")).first().getDouble(0)
    assert(a == b)
    assert(a == 293.91)
  }

  test("floorRound half-up on exact binary") {
    assert(one(floorRound(lit(1.005), 2)) == 1.0) // 1.005 binary is below .005
    assert(one(floorRound(lit(2.5), 0)) == 3.0)
    assert(one(floorRound(lit(1.23449), 2)) == 1.23)
  }

  test("limitBy n=2 keeps top 2 per key") {
    val df = Seq((1, 3), (1, 1), (1, 2), (2, 9)).toDF("k", "v")
    val r = limitBy(df, 2, Seq(col("k")), Seq(col("v").desc))
      .orderBy("k", "v").as[(Int, Int)].collect().toSeq
    assert(r == Seq((1, 2), (1, 3), (2, 9)))
  }

  test("argMax picks value at max version") {
    val df = Seq((1L, "old"), (5L, "new"), (3L, "mid")).toDF("ver", "v")
    assert(df.agg(argMax(col("v"), col("ver"))).first().getString(0) == "new")
  }
  test("OracleHash: pinned value, JVM recompute, lane packing") {
    import graft.functions.OracleHash
    import org.apache.spark.sql.functions._
    val r = spark.range(1).select(
      OracleHash.low64(lit("abc")).as("l"),
      OracleHash.seeded32(5, lit("abc")).as("s5"),
      OracleHash.combine(Seq(lit(1L), lit(-2L))).as("c")).first()
    // md5("abc") = 900150983cd24fb0 d6963f7d28e17f72; last 8 bytes BE
    // as signed: 0xd6963f7d28e17f72 - 2^64
    assert(r.getLong(0) == -2984127896297046158L)
    def jvm(x: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes)
    // seeded32(5) = round 1, word 1 of md5("m|abc"):
    // w1 XOR rotl32(w2, 13), words read big-endian
    val d = jvm("m|abc")
    def word(g: Int): Long =
      (g * 4 until g * 4 + 4).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
    val rot = ((word(2) << 13) | (word(2) >>> 19)) & 0xffffffffL
    val want = word(1) ^ rot
    assert(r.getLong(1) == want && want >= 0 && want < (1L << 32))
    // combine renders longs in decimal, sign included
    val dc = jvm("1,-2")
    val wantC = (8 until 16).foldLeft(0L)((a, i) => (a << 8) | (dc(i) & 0xffL))
    assert(r.getLong(2) == wantC)
  }

  test("levenshtein unicode semantics: Spark counts codepoints, not bytes") {
    import org.apache.spark.sql.functions.{levenshtein, lit}
    // Pins the cross-engine contract behind docs_near_dup_edit_distance:
    // DuckDB's levenshtein counts BYTES (café→cafe = 2, é is 2 UTF-8
    // bytes; measured 2026-08), Spark counts CODEPOINTS (= 1). The
    // oracle row is therefore exact only on ASCII corpora — this test
    // fails if a Spark upgrade silently changes the user-facing
    // codepoint semantics.
    val r = spark.range(1).select(
      levenshtein(lit("café"), lit("cafe")).as("accent"),
      levenshtein(lit("日本語テキスト"), lit("日本語のテキスト")).as("cjk"),
      levenshtein(lit("naïve"), lit("naive")).as("diaeresis")).first()
    assert(r.getInt(0) == 1, "é vs e must be ONE codepoint edit")
    assert(r.getInt(1) == 1, "inserting の must be ONE codepoint edit")
    assert(r.getInt(2) == 1)
  }
}
