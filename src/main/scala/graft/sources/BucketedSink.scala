package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the storage-side half of shuffle
  * elimination. A fact table written with `bucketBy(n, key)` +
  * `sortBy(key)` carries its hash partitioning IN THE TABLE LAYOUT:
  * every subsequent join or aggregation on the bucket key reads the
  * buckets as pre-shuffled input and plans with ZERO exchanges on
  * that side (SortMergeJoin directly over the bucketed scans). At
  * 100 TB this converts the repeated cost of shuffling a fact table
  * once per downstream job into a single write-time cost — the
  * standard warehouse layout for fact-fact joins (the reference has
  * no storage story at all; its output is a Neo4j server).
  *
  * Spark constraint (same as any bucketed warehouse): bucketed writes
  * go through the session catalog (`saveAsTable`), and both sides of
  * a co-located join must agree on bucket count and key.
  */
object BucketedSink {

  /** Writes `df` as a bucketed, per-bucket-sorted parquet table.
    * `buckets` should be sized so one bucket ≈ one task's worth of
    * data at the target scale (and, for co-located joins, match the
    * other fact's bucket count).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Reads a bucketed table back (bucket metadata rides the catalog
    * entry, so joins on the bucket key skip their exchange).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
