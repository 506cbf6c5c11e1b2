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
    * emitters): `Lanes` 32-bit lanes derived from `Digests` md5
    * digest(s). Since round 5 ALL 16 lanes come from ONE
    * domain-separated digest ("m|" prefix): its four 32-bit words
    * directly (round 0) plus three xor-rotate remix rounds —
    * lane(r,g) = w(g) XOR rotl32(w((g+r)%4), RotBy(r-1)). md5 was 4×
    * the MinHash pipeline's CPU when each shingle paid 4 digests
    * (docs_minhash_lsh_pairs 12.5 s in BENCH_r04); the remix buys the
    * same 16-lane width for one digest. The lanes are marginally
    * uniform but share 128 bits of entropy, so they are not mutually
    * independent — acceptable for LSH banding, and the recall property
    * test against the exact-Jaccard path still gates it. */
  val Lanes = 16
  val LanesPerDigest = 16
  val Digests: Int = Lanes / LanesPerDigest
  private val RotBy = Seq(13, 17, 23)

  /** Signed big-endian int64 of md5(c)'s last 8 bytes (Spark side).
    * Round-15: computed by the native [[Md5Low64]] kernel — same value
    * as the original `conv(substring(md5(c), …))` formulation (pinned
    * in ChFunctionsSpec), without the per-row hex-string allocation and
    * base-16 string parses. */
  def low64(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(Md5Low64(expression(c)))
  }

  /** 32-bit seeded member `j` of the 16-lane family — a non-negative
    * long < 2^32 (32-bit values are the standard MinHash width). All
    * 16 lanes derive from ONE digest; see the width-contract note. */
  def seeded32(j: Int, c: Column): Column =
    lane32(digests32(c)(j / LanesPerDigest), j)

  /** The shared digest(s) behind the 16 [[seeded32]] lanes — project
    * these once when feeding an aggregate, so the md5 sharing doesn't
    * depend on codegen CSE reaching across the explode/aggregate
    * boundary. The "m|" prefix domain-separates the MinHash family
    * from [[low64]] digests of the same strings (fingerprints, band
    * hashes), which would otherwise share words 2-3.
    * Round-15: the digest is now the native [[Md5Words32]] kernel's
    * array<long> of the four 32-bit words (value-identical to the old
    * `conv(substring(md5('m|'||c), g*8+1, 8), 16, 10)` reads — pinned
    * in ChFunctionsSpec), so deriving the 16 lanes costs four array
    * reads + bitwise ops instead of 20 hex substring/base-16 parses. */
  def digests32(c: Column): IndexedSeq[Column] = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    IndexedSeq(column(Md5Words32(expression(c))))
  }

  /** 32-bit word `g` (big-endian) of a [[digests32]] words array. */
  private def word32(digestWords: Column, g: Int): Column =
    get(digestWords, lit(g))

  /** Lane `j` out of a [[digests32]] words array: round j/4, word j%4.
    * Round 0 is the word itself; round r>=1 xors in a rotation of a
    * different word. Bitwise ops only — no ANSI overflow risk (operands
    * stay < 2^32; the widest intermediate, w << 31, is < 2^63). */
  def lane32(digestWords: Column, j: Int): Column = {
    val r = j / 4
    val g = j % 4
    if (r == 0) word32(digestWords, g)
    else {
      val s = RotBy(r - 1)
      val o = word32(digestWords, (g + r) % 4)
      val rot = shiftleft(o, s).bitwiseOR(shiftright(o, 32 - s))
        .bitwiseAND(lit(0xffffffffL))
      word32(digestWords, g).bitwiseXOR(rot)
    }
  }

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

  /** DuckDB SQL for [[seeded32]] — no sign handling needed: every
    * operand stays < 2^32, so UBIGINT→BIGINT casts are in range and
    * the shifts cannot overflow BIGINT. Mirrors [[lane32]] word for
    * word (DuckDB re-derives each word from md5; its optimizer shares
    * the digest, and oracle-side cost is not gated anyway). */
  def duckSeeded32(j: Int, e: String): String = {
    def w(g: Int) =
      s"(('0x' || substring(md5('m|' || $e), ${g * 8 + 1}, 8))::UBIGINT)::BIGINT"
    val r = j / 4
    val g = j % 4
    if (r == 0) w(g)
    else {
      val s = RotBy(r - 1)
      val o = w((g + r) % 4)
      s"xor(${w(g)}, ((($o << $s) | ($o >> ${32 - s})) & 4294967295))"
    }
  }

  /** DuckDB SQL for [[combine]] over BIGINT-typed expressions. */
  def duckCombine(es: Seq[String]): String =
    duckLow64(es.map(e => s"($e)::VARCHAR").mkString(" || ',' || "))
}
