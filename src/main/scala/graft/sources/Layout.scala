package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ChFunctions._
import graft.operators.Dedup

/** Storage layout — the Spark mapping of the reference's MergeTree
  * physical design (SURVEY §2.1 S2/S3, §4):
  *
  *   ENGINE_PARTITION_KEY "toYYYYMM(__timestamp)"  → partitionBy(yyyymm)
  *   ENGINE_SORTING_KEY   "id, __timestamp"        → sortWithinPartitions
  *
  * Partition pruning then happens in Catalyst for free: a predicate on
  * the partition column skips whole directories (visible as
  * PartitionFilters in explain), and the within-partition sort gives
  * parquet row-group min/max skipping on the sort key — the two physical
  * decisions that make a 100 TB log queryable.
  */
object Layout {

  /** Write `df` as an append-only MergeTree-style table: partitioned by
    * yyyymm of `tsCol`, sorted inside partitions by `sortCols`.
    *
    * `bloomNdv` (column → expected distinct count) adds a parquet
    * bloom filter per listed column — the ClickHouse
    * `bloom_filter` skip-index analogue, and the third leg of the
    * physical design: partition pruning cuts directories, the sort key
    * cuts row groups by min/max, and blooms cut row groups for point
    * lookups on NON-sort columns (where min/max spans everything).
    * Readers need no change: parquet row-group filtering consults the
    * bloom automatically for `=` / IN predicates. */
  def writeAppendLog(df: DataFrame, tsCol: String, sortCols: Seq[String],
                     path: String, mode: String = "append",
                     bloomNdv: Map[String, Long] = Map.empty): Unit = {
    val w = df.withColumn("yyyymm", toYYYYMM(col(tsCol)))
      .repartition(col("yyyymm"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode)
    bloomNdv.foldLeft(w) { case (wr, (c, ndv)) =>
      // dictionary off for bloom columns: parquet-mr omits the bloom
      // when a chunk is fully dict-encoded (the dictionary already
      // filters exactly), and a genuinely high-NDV lookup column blows
      // past the dictionary size limit at real scale anyway — small-SF
      // tests would otherwise never exercise the bloom path at all
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.partitionBy("yyyymm").parquet(path)
  }

  /** Read a partitioned log; predicates on `yyyymm` prune directories. */
  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hash-bucketed table layout: persist `df` clustered (and sorted)
    * by `key` into `buckets` files per partition, as a catalog table at
    * an explicit `path`.
    *
    * This is the co-located-join story at 100 TB: the bucket id IS a
    * hash partitioning, so a scan of the table reports
    * `outputPartitioning = HashPartitioning(key, buckets)` and Catalyst
    * plans joins and aggregations ON THE BUCKET KEY with no Exchange of
    * the bucketed side — the every-query shuffle of the big fact table
    * (the single largest cost in a shuffle-bound cluster) is paid once
    * at write time instead. Two tables bucketed the same way join
    * mapper-locally (asserted in LayoutSpec). The ClickHouse analogue
    * is the MergeTree sharding key; the Spark-native mechanism is
    * `bucketBy` + `saveAsTable`, which needs a catalog entry (plain
    * `.parquet(path)` writes would lose the bucket metadata). */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
                    table: String, path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** The ReplacingMergeTree background merge (users_latest.datasource:
    * 16-19): rewrite the log keeping only the max-version row per key,
    * preserving the partition layout. Run periodically, it bounds the
    * dedup-on-read cost exactly like ClickHouse part merges do; readers
    * keep using the same FINAL view semantics before/after. */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
              version: org.apache.spark.sql.Column, tsCol: String,
              sortCols: Seq[String]): Unit = {
    val cur = readLog(spark, path).drop("yyyymm")
    val latest = Dedup.latestByKey(cur, keys, version,
      payload = cur.columns.filterNot(keys.contains).toSeq)
    val tmp = path + "_compacting"
    writeAppendLog(latest, tsCol, sortCols, tmp, mode = "overwrite")
    // two-step swap (single-FS renames; a lake-format table commit in
    // prod). Every rename is checked; the backup is deleted only after
    // the new table is in place, so a failure at any step leaves either
    // the old table or the backup recoverable on disk.
    val fs = new java.io.File(path)
    val bak = new java.io.File(path + "_old")
    // a leftover backup from a crashed previous compact is garbage (the
    // live table at `path` is authoritative) — clear it or the rename
    // below fails forever
    if (bak.exists()) deleteRec(bak)
    if (!fs.renameTo(bak))
      throw new java.io.IOException(s"compact: could not move $path aside")
    if (!new java.io.File(tmp).renameTo(fs)) {
      if (!bak.renameTo(fs))
        throw new java.io.IOException(
          s"compact: install failed AND rollback failed — table preserved at $bak")
      throw new java.io.IOException(s"compact: could not install $tmp at $path")
    }
    deleteRec(bak)
  }

  private[graft] def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
