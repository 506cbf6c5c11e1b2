package graft

import org.apache.spark.sql.types._
import graft.sources.KitParser
import graft.sources.KitParser.{AppendOnly, ReplaceByVersion}

/** Parse the real reference kit files (read-only checkout) and check the
  * catalog entries against the SURVEY §1 analysis. */
class KitParserSpec extends SparkSpec {

  private val kits = new java.io.File("/root/reference/kits")

  test("all 10 reference datasource files parse under kit-relative keys") {
    val cat = KitParser.parseKit(kits)
    // kit-relative keys keep the pg and mysql dialects distinct (their
    // schemas differ under the same basename)
    assert(cat.keySet == Set(
      "users/pg/users_raw", "users/pg/users_latest", "users/pg/users_batch",
      "users/mysql/users_raw", "users/mysql/users_latest",
      "airport/mysql/flights_raw", "airport/mysql/passengers_raw",
      "airport/mysql/baggage_raw"))
    assert(cat.size == 8)
    // the two dialects of users_raw must carry their own schemas
    assert(cat("users/pg/users_raw").schema("updated_at").dataType == LongType)
    assert(cat("users/mysql/users_raw").schema("updated_at").dataType == TimestampNTZType)
  }

  test("users_raw (pg): JSONPaths, nullable unix-micros, MergeTree layout") {
    val d = KitParser.parseDatasource("users_raw",
      new String(java.nio.file.Files.readAllBytes(new java.io.File(kits,
        "users/pg/datasources/users_raw.datasource").toPath), "UTF-8"))
    assert(d.engine == AppendOnly)
    assert(d.partitionKey.contains("toYYYYMM(__timestamp)"))
    assert(d.sortingKey == Seq("id", "__timestamp"))
    assert(d.kafkaTopic.contains("postgres_cdc_demo.public.users"))
    val byName = d.columns.map(c => c.name -> c).toMap
    assert(byName("id").dataType == ShortType && !byName("id").nullable)
    assert(byName("id").jsonPath.contains("$.id"))
    assert(byName("updated_at").dataType == LongType && byName("updated_at").nullable)
    assert(byName("__deleted").dataType == StringType)
    assert(d.schema.fieldNames.length == 12)
  }

  test("users_latest (pg): ReplacingMergeTree with updated_at version") {
    val d = KitParser.parseDatasource("users_latest",
      new String(java.nio.file.Files.readAllBytes(new java.io.File(kits,
        "users/pg/datasources/users_latest.datasource").toPath), "UTF-8"))
    assert(d.engine == ReplaceByVersion("updated_at"))
    assert(d.sortingKey == Seq("id"))
    val byName = d.columns.map(c => c.name -> c).toMap
    assert(byName("lang").dataType == StringType) // FixedString(2)
    assert(byName("created_at").dataType == TimestampNTZType) // DateTime64(6)
    assert(byName("email_verified").dataType == ShortType) // UInt8
  }

  test("baggage_raw (mysql): Int32 keys, Float64 weight") {
    val d = KitParser.parseDatasource("baggage_raw",
      new String(java.nio.file.Files.readAllBytes(new java.io.File(kits,
        "airport/mysql/datasources/baggage_raw.datasource").toPath), "UTF-8"))
    val byName = d.columns.map(c => c.name -> c).toMap
    assert(byName("id").dataType == IntegerType)
    assert(byName("weight").dataType == DoubleType)
    assert(d.engine == AppendOnly)
  }
}
