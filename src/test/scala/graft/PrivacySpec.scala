package graft

import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** The PII scrub against hand-written ground truth: synthetic strings
  * with known PII (the corpus tables contain only digit-run ids, so
  * the email/phone/IP maskers need their own fixtures). */
class PrivacySpec extends SparkSpec {

  test("scrub masks emails, phones, IPs, and digit runs — and only those") {
    import spark.implicits._
    val rows = Seq(
      ("contact jane.doe+spam@mail.example.org for details", "contact <EMAIL> for details"),
      ("call +1 (415) 555-0134 now", "call <PHONE> now"),
      ("server at 10.0.123.7 responded", "server at <IP> responded"),
      ("order 12345 shipped to box 9", "order XXXXX shipped to box X"),
      ("mixed: bob@x.io or 555-123-4567 or 192.168.0.1 or id 77",
        "mixed: <EMAIL> or <PHONE> or <IP> or id XX"),
      ("no pii here at all", "no pii here at all"),
      // < 7 digits is NOT a phone — numeric ranges keep their shape
      ("pages 10 - 250 revised", "pages XX - XXX revised"),
      // digit-dense dates ARE redacted by design (DOB is PII)
      ("born 1994-05-01 in town", "born <PHONE> in town"),
      ("", ""))
    val got = rows.toDF("s", "want")
      .select(Privacy.scrub(col("s")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("digit count audits exactly the characters the digit masker touches") {
    import spark.implicits._
    val df = Seq("a1b22c333", "no digits", "").toDF("s")
      .select(col("s"), Privacy.digitCount(col("s")).as("n"),
        Privacy.maskDigits(col("s")).as("m"))
    df.collect().foreach { r =>
      val masked = r.getString(2)
      assert(r.getLong(1) == masked.count(_ == 'X') - r.getString(0).count(_ == 'X'))
    }
  }

  test("customer scrub leaves no digit in any redacted name, counts match") {
    val out = Privacy.customerPiiScrub(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit), r)
      assert(r.getLong(2) == r.getString(1).count(_ == 'X'), r)
    }
  }

  test("document scrub redacts exactly one email, IP and phone per row, no digit survives") {
    val out = Privacy.docsPiiScrub(spark, sf)
    val n = Tables.documents(spark, sf).count()
    val rows = out.collect()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 1, r)
      assert(r.getLong(5) > 0, r) // the injected tail always carries digits
    }
    // idempotence: the scrubbed output is digit-free and marker-inert,
    // so scrub(scrub(x)) == scrub(x) for every row
    val once = Privacy.scrub(col("c_name"))
    val reScrubbed = Tables.customer(spark, sf)
      .select(md5(once).as("a"), md5(Privacy.scrub(once)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(reScrubbed == 0, "re-scrubbing changed a scrubbed value")
    // and digests vary with the underlying text (not a constant hash)
    val digests = rows.map(_.getString(1)).toSet
    assert(digests.size > 1, "digests must vary with the underlying text")
  }
}
