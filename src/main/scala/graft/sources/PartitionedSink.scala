package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the standard event-lake storage
  * shape: one directory per day (`ds=YYYY-MM-DD/`), rows sorted by
  * timestamp within each file. Time-bounded reads then touch ONLY the
  * matching day directories (partition pruning happens at planning,
  * before any file I/O), and the within-file sort keeps min/max
  * row-group statistics tight for further predicate skipping.
  *
  * At 100 TB this is the difference between scanning the lake and
  * scanning a day: a `ts >= X` filter on an unpartitioned table reads
  * every file and relies on row-group stats; on this layout the
  * planner's PartitionFilters eliminate whole directories
  * (spec-pinned via the explain output).
  *
  * The reference connector has no storage story (its sink is a Neo4j
  * server); this is the batch-lake counterpart of [[BucketedSink]]
  * (bucketBy = join-key co-location, partitionBy = predicate
  * elimination; they compose).
  */
object PartitionedSink {

  /** Writes an events-shaped frame (needs a `ts` timestamp column)
    * date-partitioned by day with a within-partition time sort.
    */
  def writeDaily(events: DataFrame, path: String): Unit =
    events
      .withColumn("ds", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("ds"))
      .sortWithinPartitions(col("ts"))
      .write
      .format("parquet")
      .mode("overwrite")
      .partitionBy("ds")
      .save(path)

  /** Reads the daily layout back; `ds` surfaces as a string column
    * usable in pruning predicates.
    */
  def readDaily(spark: SparkSession, path: String): DataFrame =
    spark.read.format("parquet").load(path)
}
