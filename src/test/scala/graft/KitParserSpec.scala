package graft

import org.apache.spark.sql.types._
import graft.sources.KitParser
import graft.sources.KitParser.{AppendOnly, ReplaceByVersion}

/** Parse the real reference kit files (read-only checkout) and check the
  * catalog entries against the SURVEY §1 analysis. */
class KitParserSpec extends SparkSpec {

  private val kits = new java.io.File("/root/reference/kits")

  test("all 10 reference datasource files parse") {
    val cat = KitParser.parseKit(kits)
    // users pg+mysql: users_raw/users_latest (+pg users_batch); airport:
    // flights/passengers/baggage raws — name-keyed map collapses the
    // pg/mysql duplicates of users_raw/users_latest
    assert(cat.keySet == Set("users_raw", "users_latest", "users_batch",
      "flights_raw", "passengers_raw", "baggage_raw"))
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
