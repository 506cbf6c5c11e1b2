package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** ScalaCheck properties for the latest-state invariants (SURVEY §5
  * test plan #3): dedup is permutation-invariant w.r.t. arrival order,
  * idempotent under at-least-once duplicate delivery, and the three
  * strategies agree on arbitrary logs. */
object DedupProps extends Properties("Dedup") {

  // same config as SparkSpec: whichever suite wins the getOrCreate race
  // must produce the session every other suite expects (incl. the
  // GraftExtensions parser/functions)
  private lazy val spark = TestSession.session

  private val eventGen = for {
    id <- Gen.choose(1L, 8L)
    ver <- Gen.choose(1L, 50L)
    payload <- Gen.alphaStr.map(_.take(6))
  } yield (id, ver, payload)

  // (id, ver) must identify a payload uniquely for latest-state to be
  // well-defined (the reference guarantees this: updated_at is the
  // version of a row image); dedupe generator output accordingly.
  private val logGen = Gen.listOfN(40, eventGen)
    .map(_.groupBy(e => (e._1, e._2)).values.map(_.head).toList)
    .suchThat(_.nonEmpty)

  private def d2(rows: List[(Long, Long, String)]): Set[(Long, Long, String)] = {
    import spark.implicits._
    val df = rows.toDF("id", "ver", "payload")
    Dedup.latestByKey(df, Seq("id"), struct(col("ver"), col("payload")),
        Seq("ver", "payload"))
      .as[(Long, Long, String)].collect().toSet
  }

  property("permutation-invariant") = Prop.forAll(logGen) { rows =>
    d2(rows) == d2(rows.reverse)
  }

  property("duplicate-idempotent") = Prop.forAll(logGen) { rows =>
    d2(rows) == d2(rows ++ rows)
  }

  property("window D1 == argMax D2") = Prop.forAll(logGen) { rows =>
    import spark.implicits._
    val df = rows.toDF("id", "ver", "payload")
    val d1 = Dedup.latestByWindow(df, Seq(col("id")),
        Seq(col("ver"), col("payload")))
      .as[(Long, Long, String)].collect().toSet
    d1 == d2(rows)
  }

  property("incremental D3 == D2 for any watermark") =
    Prop.forAll(logGen, Gen.choose(0L, 50L)) { (rows, wm) =>
      import spark.implicits._
      val df = rows.toDF("id", "ver", "payload")
      val prior = Dedup.latestByKey(df.filter(col("ver") <= wm), Seq("id"),
        struct(col("ver"), col("payload")), Seq("ver", "payload"))
      val d3 = Dedup.incrementalSnapshot(prior, df, Seq("id"),
          struct(col("ver"), col("payload")), "ver",
          Seq("ver", "payload"), lit(wm))
        .as[(Long, Long, String)].collect().toSet
      d3 == d2(rows)
    }
}
