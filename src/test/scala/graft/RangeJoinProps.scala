package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** ScalaCheck properties for the binned interval-overlap kernel: on
  * arbitrary generated session sets the hour-bucket decomposition must
  * equal the naive non-equi overlap join — including instant (start ==
  * end) sessions, sessions spanning many buckets, exact-boundary
  * touches, and users with several sessions. */
object RangeJoinProps extends Properties("RangeJoin") {

  private lazy val spark = TestSession.session

  // minutes inside a narrow band force bucket collisions; spans up to
  // 9 hours force multi-bucket sessions; duplicates collapse to the
  // unique (user, session) key the operator requires
  private val sessGen = Gen.listOfN(20, for {
    u <- Gen.choose(1L, 6L)
    startMin <- Gen.choose(0L, 600L)
    durMin <- Gen.frequency((3, Gen.const(0L)), (5, Gen.choose(1L, 90L)), (2, Gen.choose(91L, 540L)))
  } yield (u, startMin, startMin + durMin))
    .map(_.zipWithIndex.map { case ((u, s, e), i) => (u, i.toLong, s, e) })

  property("binned == naive on arbitrary interval sets") =
    Prop.forAll(sessGen) { rows =>
      import spark.implicits._
      val sess = rows.toDF("user_id", "session_id", "s_min", "e_min")
        .select(col("user_id"), col("session_id"),
          expr("cast(timestamp_micros(cast(s_min * 60000000 as bigint)) as timestamp_ntz)").as("session_start"),
          expr("cast(timestamp_micros(cast(e_min * 60000000 as bigint)) as timestamp_ntz)").as("session_end"))
      val got = RangeJoin.concurrencyFrom(sess).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
          r.getAs[Long]("concurrent_sessions")).toMap
      val naive = rows.map { case (u, id, s, e) =>
        (u, id) -> rows.count { case (u2, id2, s2, e2) =>
          u2 != u && s2 <= e && s <= e2 && (u2, id2) != (u, id)
        }.toLong
      }.toMap
      val ok = got == naive
      if (!ok) println(s"MISMATCH rows=$rows\ngot=$got\nnaive=$naive")
      ok
    }
}
