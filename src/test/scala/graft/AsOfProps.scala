package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** ScalaCheck properties for the as-of join: on arbitrary keyed
  * timelines the union+window implementation must equal a brute-force
  * "latest right row at or before" scan, stay invariant under input
  * permutation, and match inclusively at equal instants. */
object AsOfProps extends Properties("AsOfJoin") {

  // same config as SparkSpec (getOrCreate race contract across suites)
  private lazy val spark = TestSession.session

  // small key/time domains force collisions: same-instant matches,
  // keys with no history, multiple versions per instant boundary
  private val leftGen = Gen.listOfN(25, for {
    k <- Gen.choose(1L, 5L)
    t <- Gen.choose(1L, 20L)
    id <- Gen.choose(1L, 1000L)
  } yield (k, t, id)).map(_.distinct)

  private val rightGen = Gen.listOfN(15, for {
    k <- Gen.choose(1L, 5L)
    t <- Gen.choose(1L, 20L)
    v <- Gen.choose(1L, 99L)
  } yield (k, t, v))
    // contract: right unique per (key, ts)
    .map(_.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList)

  private def run(left: List[(Long, Long, Long)],
                  right: List[(Long, Long, Long)]): Map[(Long, Long, Long), Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("k", "t", "row_id")
    val r = right.toDF("k", "t", "state")
    AsOfJoin.asOfJoin(l, r, Seq("k"), "t", Seq("state"))
      .collect().map(row => ((row.getLong(0), row.getLong(1), row.getLong(2)),
        if (row.isNullAt(3)) None else Some(row.getLong(3)))).toMap
  }

  private def brute(left: List[(Long, Long, Long)],
                    right: List[(Long, Long, Long)]): Map[(Long, Long, Long), Option[Long]] =
    left.map { case (k, t, id) =>
      val prior = right.filter(r => r._1 == k && r._2 <= t)
      (k, t, id) -> (if (prior.isEmpty) None
                     else Some(prior.maxBy(_._2)._3))
    }.toMap

  property("equals brute-force latest-at-or-before") =
    Prop.forAll(leftGen, rightGen) { (l, r) => run(l, r) == brute(l, r) }

  property("input-order invariant") =
    Prop.forAll(leftGen, rightGen) { (l, r) =>
      run(l.reverse, r.reverse) == run(l, r)
    }
}
