package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's cross-engine-reproducible 64-bit hash family:
  * `low64(x)` = the LAST 8 bytes of md5(x), read big-endian, as a
  * signed 64-bit integer.
  *
  * Why this and not xxhash64: the correctness gate re-computes every
  * oracled query in a second engine (DuckDB), and Spark's xxhash64 is
  * not reproducible there — which forced every hash-bearing endpoint
  * (MinHash signatures, LSH bands, SimHash) into weaker rows-only
  * checks. md5 is bit-identical in every engine, and both sides can
  * read the same 8 bytes: Spark via `conv` on hex substrings, DuckDB
  * via a `('0x' || substring(md5(x), 17, 16))::UBIGINT` cast. The
  * sign interpretation is pinned by [[duckLow64]]'s HUGEINT recentre.
  *
  * Cost: md5 is a few× slower per byte than xxhash64, a constant
  * factor on a linear, shuffle-free step of any pipeline that uses it
  * (hashing is never the wide stage). Deployments that want the last
  * factor back and don't need second-engine verification can swap this
  * one function for xxhash64 — every consumer routes through here.
  *
  * Seeded family: `seeded(j, x)` = low64(md5("j|" || x)) — seed
  * diversity comes from the digest itself, so no wrap-around
  * arithmetic (Spark 4 runs ANSI mode; unchecked multiply would throw,
  * and checked multiply can't be mirrored in DuckDB).
  */
object OracleHash {

  /** The seeded-32 family's width contract, shared by every consumer
    * (MinHash signatures, the per-row streaming form, the DuckDB CTE
    * emitters): `Lanes` 32-bit lanes packed `LanesPerDigest` to an md5
    * digest. Changing the MinHash width means changing ONE constant —
    * the lane→digest arithmetic everywhere derives from these. */
  val Lanes = 16
  val LanesPerDigest = 4
  val Digests: Int = Lanes / LanesPerDigest

  /** Signed big-endian int64 of md5(c)'s last 8 bytes (Spark side).
    * Two 32-bit `conv` halves recombined with shift/or — bitwise ops
    * carry no ANSI overflow check and reconstruct the exact bit
    * pattern, negative range included. */
  def low64(c: Column): Column = {
    val h = md5(c)
    shiftleft(conv(substring(h, 17, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(h, 25, 8), 16, 10).cast("long"))
  }

  /** 32-bit seeded member `j` of a 16-lane family: lane `j%4` (8 hex
    * chars, big-endian) of md5("<j/4>|" || x), as a non-negative long
    * < 2^32 — 32-bit values are the standard MinHash width. Four lanes
    * share one digest, and whole-stage codegen's common-subexpression
    * elimination collapses the shared md5 calls, so a 16-lane MinHash
    * signature pays 4 md5s per shingle, not 16 (measured 2.4× on the
    * LSH pair query before this packing). */
  def seeded32(j: Int, c: Column): Column =
    lane32(digests32(c)(j / LanesPerDigest), j)

  /** The four shared hex digests behind the 16 [[seeded32]] lanes —
    * project these once when feeding an aggregate, so the md5 sharing
    * doesn't depend on codegen CSE reaching across the explode/
    * aggregate boundary. */
  def digests32(c: Column): IndexedSeq[Column] =
    (0 until Digests).map(g => md5(concat(lit(s"$g|"), c)))

  /** Lane `j%4` out of a [[digests32]] hex digest. */
  def lane32(digestHex: Column, j: Int): Column =
    conv(substring(digestHex, (j % LanesPerDigest) * 8 + 1, 8), 16, 10).cast("long")

  /** Combine several long-typed hash columns order-sensitively:
    * low64 of their comma-joined decimal renderings (Long.toString and
    * DuckDB's BIGINT::VARCHAR agree on every value, sign included). */
  def combine(cols: Seq[Column]): Column =
    low64(concat_ws(",", cols.map(_.cast("string")): _*))

  // ---- DuckDB mirrors (string emitters for SparkEntry.oracleSql) ----

  /** DuckDB SQL computing [[low64]] of the expression `e`. `e` is
    * inlined twice — pass a column reference or cheap expression. */
  def duckLow64(e: String): String = {
    val u = s"(('0x' || substring(md5($e), 17, 16))::UBIGINT)"
    s"CAST(CAST($u AS HUGEINT) - CASE WHEN $u >= 9223372036854775808::UBIGINT " +
      s"THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
  }

  /** DuckDB SQL for [[seeded32]] — no sign handling needed: the lane
    * value is < 2^32, so the UBIGINT→BIGINT cast is always in range. */
  def duckSeeded32(j: Int, e: String): String =
    s"(('0x' || substring(md5('${j / LanesPerDigest}|' || $e), " +
      s"${(j % LanesPerDigest) * 8 + 1}, 8))::UBIGINT)::BIGINT"

  /** DuckDB SQL for [[combine]] over BIGINT-typed expressions. */
  def duckCombine(es: Seq[String]): String =
    duckLow64(es.map(e => s"($e)::VARCHAR").mkString(" || ',' || "))
}
