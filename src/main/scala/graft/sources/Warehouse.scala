package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Layout-aware parquet persistence — the 100 TB co-location toolkit.
  *
  * Two levers a large deployment uses constantly, absent from the reference
  * (whose sink is six full-replace JDBC tables, spotify-etl.py:272-280):
  *
  *  - **Partitioned writes**: directory-level partition pruning; a filter on
  *    the partition column never opens non-matching files.
  *  - **Bucketed writes**: pre-shuffled storage. Two tables bucketed on the
  *    same key with the same bucket count join WITHOUT either side
  *    shuffling — the single biggest exchange eliminator for repeated
  *    fact-fact joins. Requires `saveAsTable` (bucket metadata lives in the
  *    catalog, not the files).
  *
  * `WarehouseSpec` proves both properties from the physical plans.
  */
object Warehouse {

  /** Hive-style partitioned parquet write (`path/col=value/...`). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + in-bucket-sorted managed table keyed for shuffle-free joins
    * and merge-friendly scans. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    writeBucketedKeys(df, table, buckets, bucketCol)

  /** Multi-key variant (round 8): bucket on the FULL join key — a compound
    * equi-join (e.g. the band probe's (bpos, bkey)) only gets the
    * exchange-free plan when the bucket spec matches the join keys exactly;
    * bucketing on a subset leaves the planner free to disable the bucketed
    * scan and re-shuffle both sides. */
  def writeBucketedKeys(
      df: DataFrame, table: String, buckets: Int, keys: String*): Unit = {
    dropStale(df.sparkSession, table)
    // Repartition ON THE BUCKET SPEC before the write (round 11): Spark's
    // bucketBy writes one file per (input task × bucket), so an N-partition
    // input fragments the table into up to N×buckets files — measured: the
    // retrieval postings landed as 256 files for 8 buckets (32-task scan
    // input), and ANN compaction — whose entire purpose is consolidation —
    // wrote 2,541 files for 16 buckets from its 9-generation union read,
    // making the post-compaction serve 4× SLOWER than the fragmented one
    // it replaced. HashPartitioning(keys, buckets) is the same
    // pmod(murmur3) bucket function the table spec uses, so each output
    // task carries exactly one bucket id ⇒ exactly ≤ `buckets` files, one
    // per bucket. This is also the honest version of the documented
    // contract ("the bucketed write IS the shuffle, paid once"): the
    // exchange now actually exists at write time, and every serving scan
    // opens `buckets` files instead of hundreds.
    //
    // PARALLELISM CAP (round-11 ADVICE): the repartition also caps the
    // write stage at exactly `buckets` tasks — the deliberate price of
    // the one-file-per-bucket contract. At the 8–16 buckets these
    // query-bounded indexes use that is fine on any box, but a 100 TB
    // compaction must scale `buckets` with data volume (buckets ≈
    // volume / healthy-file-size keeps per-task output bounded AND
    // preserves consolidation — bucket count is a table property chosen
    // at write time, not a fixed constant of this method), or pre-shuffle
    // wider and sortWithinPartitions if a skewed bucket outgrows one
    // task's memory; callers pass `buckets`, so the dial already exists.
    df.repartition(buckets, keys.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Overwrite a managed table ACROSS PROCESSES (round 8): a fresh
    * in-memory catalog doesn't know the previous run's table, so a bare
    * `Overwrite` saveAsTable takes the CREATE path and dies on
    * LOCATION_ALREADY_EXISTS against the stale warehouse directory. Drop
    * the catalog entry (same-process reruns) AND clear the on-disk
    * location (cross-process reruns) before writing — the "remove the
    * existing location first" the error message prescribes, as the
    * library's job rather than every caller's. */
  def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // round 9 (ADVICE): resolve the location through the Hadoop FileSystem
    // API — the java.nio walk only worked for file:// warehouses (on
    // hdfs://, s3a://… it silently no-op'd, letting the
    // LOCATION_ALREADY_EXISTS failure this guard exists for return) and
    // leaked the Files.walk stream handle on large tables.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Compressed JSON-Lines write — the interchange format crawl/annotation
    * corpora arrive in (round 2). Gzip per part-file; splittability comes
    * from many parts, not intra-file splits. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .json(path)

  /** JSONL read with a PINNED schema — never `inferSchema` at scale: an
    * inference pass reads the entire corpus once before the real job, and a
    * skewed sample can silently widen or narrow types between runs.
    * `columnNameOfCorruptRecord` quarantines malformed lines into `_bad`
    * instead of nulling whole rows silently (PERMISSIVE) or killing the job
    * (FAILFAST). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_bad", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(path)
}
