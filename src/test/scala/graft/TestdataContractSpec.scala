package graft

import org.apache.spark.sql.types._

/** Schema contract for the harness testdata (TESTDATA.md).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed a physical encoding once (events.ts: int64-nanos →
  * TIMESTAMP_MICROS ntz), which silently broke every events reader for a
  * full round because the failure surfaced only as absent correctness
  * rows. This spec pins the dtypes the Tables readers assume, per table
  * per column, and fails NAMING THE DRIFTED COLUMN so the next regen
  * costs minutes, not a round.
  *
  * The assertions run on the RAW scan (Tables.raw), not the normalized
  * readers, so they describe the on-disk contract; `events.ts` gets a
  * set of admissible encodings because Tables.events branches on it.
  */
class TestdataContractSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  // columns where more than one physical encoding is admissible because
  // the reader normalizes (keep in sync with the corresponding reader)
  private val flexible: Map[(String, String), Set[DataType]] = Map(
    // Tables.events branches: int64 nanos | timestamp | timestamp_ntz
    ("events", "ts") -> Set[DataType](LongType, TimestampType, TimestampNTZType),
    // timestamp columns used only via literals/comparisons; either
    // tz-adjusted or ntz µs works for every query + oracle pair
    ("orders", "o_orderdate") -> Set[DataType](TimestampType, TimestampNTZType),
    ("lineitem", "l_shipdate") -> Set[DataType](TimestampType, TimestampNTZType)
  )

  for (table <- expected.keys.toSeq.sorted) {
    test(s"testdata contract: $table") {
      val schema = Tables.raw(spark, sf, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val problems = Seq.newBuilder[String]
      for ((colName, want) <- expected(table).toSeq.sortBy(_._1)) {
        byName.get(colName) match {
          case None =>
            problems += s"$table.$colName MISSING (have: ${schema.fieldNames.mkString(", ")})"
          case Some(got) if got != want =>
            problems += s"$table.$colName DRIFTED: scan dtype $got, readers assume $want"
          case _ => ()
        }
      }
      for (((t, colName), admissible) <- flexible.toSeq.sortBy(_._1) if t == table) {
        byName.get(colName) match {
          case None => problems += s"$table.$colName MISSING"
          case Some(got) if !admissible.contains(got) =>
            problems += s"$table.$colName DRIFTED: scan dtype $got not in admissible ${admissible.mkString("{", ", ", "}")} — update Tables.$table"
          case _ => ()
        }
      }
      val extras = byName.keySet -- expected(table).keySet --
        flexible.keys.collect { case (t, c) if t == table => c }
      // new columns are fine (additive regen); report them for awareness
      // without failing
      if (extras.nonEmpty)
        info(s"$table has extra columns (ok): ${extras.toSeq.sorted.mkString(", ")}")
      val ps = problems.result()
      assert(ps.isEmpty, "\n" + ps.mkString("\n"))
    }
  }

  test("testdata contract: events normalized reader yields timestamp_ntz µs") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampNTZType,
      s"Tables.events must normalize ts to timestamp_ntz, got ${df.schema("ts").dataType}")
    assert(df.limit(1).count() == 1, "events table empty at sf0.001")
  }
}
