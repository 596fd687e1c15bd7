package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact SQL `ntile` assignment WITHOUT a global (or low-cardinality-
  * partitioned) window sort — the scale path for quantile-cutting a
  * corpus-cardinality frame (CCNet perplexity terciles, RFM scoring).
  *
  * `ntile(t) OVER (PARTITION BY g ORDER BY k)` is a pure function of a
  * row's global rank within its group, so the sort is only needed to
  * LEARN ranks — and rank ranges can be read off a histogram instead:
  * range-bucket the ordering key (order-preserving), cumsum row counts
  * over the tiny (groups × buckets) histogram, and every bucket knows
  * the closed rank interval its rows occupy. A bucket whose interval
  * falls inside one tile assigns WHOLESALE from the broadcast
  * histogram (a pure map, no exchange); only buckets straddling a
  * tile cut — at most t−1 per group, each ~n/buckets rows — pay a
  * within-bucket sort, keyed by (group, bucket) so the sort partitions
  * stay bounded no matter the group cardinality. Result is bit-equal
  * to SQL ntile for any bucket count.
  *
  * 100 TB notes: corpus-scale cost is two map-side-partial aggregates
  * (stats + histogram) and one map-only broadcast join; the windows
  * touch ≤ (t−1)·n/buckets rows per group. Raise `buckets` to shrink
  * the straddle sorts — the histogram stays broadcast-sized until
  * groups × buckets approaches millions.
  */
object HistogramNtile {

  /** Appends column `out` = `ntile(tiles) OVER (PARTITION BY groupCols
    * ORDER BY orderWithin)` to `df`.
    *
    * Caller contract: `sortAsc` must be a non-null numeric column that
    * is monotone NON-DECREASING along `orderWithin`'s total order
    * (negate for descending keys), and `orderWithin` must be a total
    * order (include a unique tie-break column). NaN keys are ranked
    * LAST (Spark's ORDER BY places NaN above every double), same as
    * the window spelling — so `orderWithin` must also rank them last.
    * Output row order is not preserved — follow with an explicit
    * orderBy.
    */
  def withNtile(df: DataFrame, groupCols: Seq[String], sortAsc: Column,
      orderWithin: Seq[Column], tiles: Int, out: String,
      buckets: Int = 256): DataFrame = {
    require(tiles >= 1, s"need tiles >= 1, got $tiles")
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val g = groupCols.map(col)
    val keyed = df.withColumn("__hs", sortAsc.cast("double"))
    // NaN is excluded from the histogram stats (a NaN max would poison
    // width for the whole group) and force-bucketed LAST, where Spark's
    // window ORDER BY would rank it — min/max skip the nulled values
    val finite = when(isnan(col("__hs")), lit(null)).otherwise(col("__hs"))
    val stats = (if (g.isEmpty) keyed.groupBy() else keyed.groupBy(g: _*))
      .agg(min(finite).as("__smin"), max(finite).as("__smax"),
        count(lit(1)).as("__n"))
    val statsJoined =
      if (g.isEmpty) keyed.crossJoin(broadcast(stats))
      else keyed.join(broadcast(stats), groupCols)
    // order-preserving range bucket: floor is monotone in __hs, the
    // top edge clamps into the last bucket, degenerate (min == max)
    // groups collapse into bucket 0, NaN sorts above every double so
    // the last bucket keeps the histogram order-preserving for it
    val width = (col("__smax") - col("__smin")) / buckets
    val bucketed = statsJoined.withColumn("__hb",
      when(isnan(col("__hs")), lit(buckets - 1))
        .otherwise(when(col("__smax") === col("__smin"), lit(0))
          .otherwise(least(floor((col("__hs") - col("__smin")) / width),
            lit(buckets - 1)))).cast("int"))
    val histKeys = g :+ col("__hb")
    val hist = bucketed.groupBy(histKeys: _*)
      .agg(count(lit(1)).as("__cnt"), first(col("__n")).as("__gn"))
    // tiny-frame cumsum: |groups| × buckets rows
    val wCum = Window.partitionBy(g: _*).orderBy(col("__hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranges = hist
      .withColumn("__before", coalesce(sum(col("__cnt")).over(wCum), lit(0L)))
      .withColumn("__tstart", tileOf(col("__before") + 1, col("__gn"), tiles))
      .withColumn("__tend",
        tileOf(col("__before") + col("__cnt"), col("__gn"), tiles))
      .select(g ++ Seq(col("__hb"), col("__before"), col("__gn"),
        col("__tstart"), col("__tend")): _*)
    val joined = bucketed.drop("__smin", "__smax", "__n")
      .join(broadcast(ranges), groupCols :+ "__hb")
    val wholesale = joined.filter(col("__tstart") === col("__tend"))
      .withColumn(out, col("__tstart"))
    val wIn = Window.partitionBy(histKeys: _*).orderBy(orderWithin: _*)
    val straddle = joined.filter(col("__tstart") =!= col("__tend"))
      .withColumn(out,
        tileOf(col("__before") + row_number().over(wIn), col("__gn"), tiles))
    wholesale.unionByName(straddle)
      .drop("__hs", "__hb", "__before", "__gn", "__tstart", "__tend")
  }

  /** Size-ADAPTIVE spelling of [[withNtile]]: at or below `threshold`
    * rows the plain SQL-ntile window runs instead — the two spellings
    * are bit-equal (HistogramNtileSpec sweeps that), so this is a
    * pure plan choice: a frame that fits one executor's sort budget
    * pays one window instead of the histogram machinery's several
    * small jobs, while anything larger takes the broadcast-rank plan
    * whose sorts never exceed ~n/buckets rows. The caller passes the
    * frame's row count (it usually has it from materializing the
    * frame); the decision is a deterministic function of the data, so
    * reruns and the oracle agree on the RESULT either way.
    */
  def withNtileAdaptive(df: DataFrame, n: Long, groupCols: Seq[String],
      sortAsc: Column, orderWithin: Seq[Column], tiles: Int, out: String,
      buckets: Int = 256, threshold: Long = 1L << 20): DataFrame =
    if (n <= threshold) {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(orderWithin: _*)
      df.withColumn(out, ntile(tiles).over(w).cast("long"))
    } else withNtile(df, groupCols, sortAsc, orderWithin, tiles, out, buckets)

  /** SQL ntile tile of global rank `r` among `n` rows with `t` tiles:
    * the first n % t tiles take ⌊n/t⌋+1 rows, the rest ⌊n/t⌋. The
    * divide-by-zero branch is unreachable when ⌊n/t⌋ = 0 (then
    * n % t = n covers every rank) and CaseWhen evaluates lazily.
    */
  private def tileOf(r: Column, n: Column, t: Int): Column = {
    val q = floor(n / t).cast("long")
    val rmd = n % t
    when(r <= (q + 1) * rmd, ceil(r / (q + 1)))
      .otherwise(rmd + ceil((r - (q + 1) * rmd) / q))
      .cast("long")
  }
}
