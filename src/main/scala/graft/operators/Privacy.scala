package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII scrubbing for a training-data pipeline: regex redaction of
  * emails, phone numbers, IPv4 addresses, and digit-run identifiers,
  * plus per-row redaction counts — the privacy pass a corpus goes
  * through before any text lands in a training shard.
  *
  * Every masker is a pure per-row `regexp_replace` projection — zero
  * shuffles, fully inside whole-stage codegen, linear in the scan: the
  * only shape acceptable for a pass that must touch every byte of a
  * 100 TB corpus. Patterns are deliberately restricted to syntax with
  * identical semantics in Java regex (Spark) and RE2 (DuckDB/most
  * scanners): character classes, bounded repetition, alternation —
  * no backreferences, no lookaround — so the same rule set is
  * portable across the scrubbing and auditing engines.
  */
object Privacy {

  /** `user@host.tld` → `<EMAIL>`. */
  def maskEmails(c: Column): Column =
    regexp_replace(c, """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>")

  /** International-ish phone shapes — at least 7 ACTUAL digits (each
    * optionally followed by up to two separator chars), not just 7
    * characters of digit-or-separator soup, so "pages 10 - 250" is
    * left alone → `<PHONE>`. Digit-dense dates ("2024-05-01") DO
    * match by design: dates of birth are PII, and a privacy pass errs
    * toward redaction. Applied after emails AND IPs: the separator
    * class includes `.`, so a dotted-quad would otherwise read as a
    * phone. */
  def maskPhones(c: Column): Column =
    regexp_replace(c, """\+?(?:[0-9][() .-]{0,2}){6,}[0-9]""", "<PHONE>")

  /** Dotted-quad IPv4 → `<IP>`. */
  def maskIPv4(c: Column): Column =
    regexp_replace(c, """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b""", "<IP>")

  /** Every remaining digit → `X` — the catch-all for account numbers,
    * ids, and anything the structured maskers missed. */
  def maskDigits(c: Column): Column =
    regexp_replace(c, "[0-9]", "X")

  /** The full scrub: emails, then IPs, then phones, then digits.
    * Order matters (most-structured patterns first, catch-all last)
    * and is part of the contract. */
  def scrub(c: Column): Column =
    maskDigits(maskPhones(maskIPv4(maskEmails(c))))

  /** Count of characters a masker would touch — audit metric for
    * "how much PII did this corpus contain". */
  def digitCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("long")

  /** Registered endpoint: redact the digit-run identifiers embedded in
    * customer names (`Customer#000000042` — the classic
    * id-inside-free-text shape) and report per-row audit counts plus a
    * digest of the redacted form (the value a downstream exact-dedup
    * or cache key uses, proving scrub-then-digest determinism).
    *
    * Scale: pure projection on the scan, no shuffle; the trailing sort
    * is the endpoint presentation contract. */
  def customerPiiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        maskDigits(col("c_name")).as("name_redacted"),
        digitCount(col("c_name")).as("n_pii_chars"),
        md5(maskDigits(col("c_name"))).as("redacted_digest"))
      .orderBy("c_custkey")

  /** Occurrences of a fixed marker in a column — audit counter for
    * "how many of each PII kind did the scrub redact". */
  private def markerCount(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) / marker.length).cast("int")

  /** The full-scrub ORACLED endpoint over the document corpus. The
    * corpus text itself is digit-free word soup, so each row gets a
    * deterministic PII tail derived from `doc_id` — an email, a
    * dotted-quad, a phone, and a digit-run reference id — built with
    * the SAME concatenation arithmetic in the DuckDB oracle. The row
    * then goes through the real [[scrub]] chain and the gate
    * hash-verifies `md5(scrubbed)`: a match proves every masker's
    * pattern produces byte-identical replacements under Java regex
    * (Spark codegen) and RE2 (DuckDB) on corpus-scale data — the
    * portability claim the pattern-design comment above makes, now
    * machine-checked end to end.
    *
    * Scale: pure per-row projection (regex + md5) inside whole-stage
    * codegen, zero shuffles before the presentation sort — the only
    * acceptable shape for a pass that touches every byte of a 100 TB
    * corpus. */
  def docsPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.documents(spark, dir)
      .select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), pmod(col("doc_id"), lit(10)).cast("string"), lit(".example.com"),
        lit(" from 10."), pmod(col("doc_id"), lit(200)).cast("string"),
        lit(".0."), pmod(col("doc_id"), lit(250)).cast("string"),
        lit(" call +1 (555) 01"), lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit("-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" ref A"), pmod(col("doc_id") * 13, lit(100000)).cast("string")).as("s"))
    val r = scrub(col("s"))
    withPii.select(
      col("doc_id"),
      md5(r).as("scrubbed_digest"),
      markerCount(r, "<EMAIL>").as("n_emails"),
      markerCount(r, "<IP>").as("n_ips"),
      markerCount(r, "<PHONE>").as("n_phones"),
      digitCount(col("s")).as("n_pii_chars"),
      length(r).cast("int").as("scrubbed_len"))
      .orderBy("doc_id")
  }
}
