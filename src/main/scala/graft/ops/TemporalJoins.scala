package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators — the as-of and range joins every event-time
 * pipeline needs (attach the latest dimension row to a fact, land points in
 * intervals). Neither exists as a Spark SQL join type; both are
 * re-expressed here as shuffle-bounded declarative plans instead of a
 * custom SparkPlan, because composition of existing operators already
 * yields the right distribution story (brief §custom-operators preference
 * order (a)).
 */
object TemporalJoins {

  /**
   * As-of join (pandas merge_asof / kdb aj semantics, backward direction):
   * for every left row, the LATEST right row with the same key and
   * rightTs <= leftTs (within `toleranceMicros` when given).
   *
   * NOT implemented as a join at all: both sides union into one stream,
   * partitioned by key and range-windowed on the timestamp, and each left
   * row picks `max(right-struct)` over its backward window — the right
   * struct leads with the timestamp, so the max IS the latest match
   * (nulls from left rows are ignored by max; equal-timestamp right rows
   * match, ties broken by the payload's own ordering). ONE shuffle on the
   * key, no broadcast, no skew amplification: a hot key costs one sorted
   * partition-local sweep, where a join would fan out len(l)×len(r).
   *
   * Timestamps must be integral (epoch micros/millis — `Tables.epochMicros`
   * shape): the backward window is a RANGE frame, and a tolerance only has
   * meaning on a numeric axis.
   *
   * Returns left.* plus a nullable `_asof` struct (`_ts` + the right row's
   * columns); unmatched left rows keep `_asof` null — left-outer semantics.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               toleranceMicros: Option[Long] = None): DataFrame = {
    def integral(df: DataFrame, c: String): Unit =
      require(Seq("bigint", "int").contains(df.schema(c).dataType.simpleString),
        s"asofJoin timestamp '$c' must be integral epoch, got " +
          df.schema(c).dataType.simpleString)
    integral(left, leftTs); integral(right, rightTs)
    toleranceMicros.foreach(t => require(t >= 0, s"negative tolerance $t"))
    val rPayload = struct(col(rightTs).cast("long").as("_ts") +:
      right.columns.filterNot(c => c == key || c == rightTs)
        .map(c => col(c)): _*)
    // left rows carry a typed null right-struct so the union lines up
    val rStructType = right.select(rPayload.as("_r")).schema("_r").dataType
    val lKeep = left.columns.map(c => col(c))
    val lSide = left.select(lKeep :+ col(key).as("_k") :+
      col(leftTs).cast("long").as("_t") :+ lit(1).as("_side") :+
      lit(null).cast(rStructType).as("_r"): _*)
    val rSide = right.select(left.columns.map(c =>
      lit(null).cast(left.schema(c).dataType).as(c)) :+ col(key).as("_k") :+
      col(rightTs).cast("long").as("_t") :+ lit(0).as("_side") :+
      rPayload.as("_r"): _*)
    val unioned = lSide.unionByName(rSide)
    val w = toleranceMicros match {
      case Some(tol) =>
        Window.partitionBy("_k").orderBy(col("_t")).rangeBetween(-tol, 0)
      case None => Window.partitionBy("_k").orderBy(col("_t"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    }
    unioned
      .withColumn("_asof", max(col("_r")).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(c)) :+ col("_asof"): _*)
  }

  /**
   * Range (interval) join: points landing inside [start, end) intervals,
   * optionally key-matched. The scalable shape is NOT the naive
   * range-predicate join (a cross product per key for Spark's planner):
   * both sides bucket onto a time-bin axis — a point lives in exactly one
   * bin, an interval explodes into the bins it covers — so the join is a
   * plain equi-join on (key, bin) with the exact range predicate as a
   * post-filter. Each (point, interval) pair meets in exactly one bin, so
   * no dedup is needed. Fan-out is bounded: intervals longer than
   * `maxSpanBins` bins fail loudly instead of silently exploding the
   * build side (pick binMicros near the typical interval length).
   */
  /**
   * Interval-overlap join: pairs of intervals (closed [start, end], the
   * sessionize shape) from `a` and `b` that intersect, optionally
   * key-matched. Same bin discipline as [[rangeJoin]] — BOTH sides explode
   * into the bins they cover and meet on a plain (key, bin) equi-join —
   * but two intervals can now share many bins, so instead of a dedup
   * shuffle the join keeps exactly ONE bin per pair: overlapping closed
   * intervals always share bin max(aStartBin, bStartBin) (the later
   * start's first bin, which the earlier interval must also cover), so
   * that bin is the pair's unique meeting point. The exact overlap
   * predicate post-filters; `overlap_us` = min(ends) − max(starts).
   * Columns are prefixed `a_`/`b_`. Both spans are capped loudly like
   * [[rangeJoin]].
   */
  def intervalJoin(a: DataFrame, b: DataFrame,
                   startCol: String, endCol: String, key: Option[String],
                   binMicros: Long, maxSpanBins: Int = 1024): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    def explodeBins(df: DataFrame, prefix: String): DataFrame = {
      val s = col(s"${prefix}_$startCol"); val e = col(s"${prefix}_$endCol")
      // e >= s is part of the guard: an inverted interval would make
      // sequence() descend and silently emit wrong bins
      val guard = when(
        e >= s && floor(e / binMicros) - floor(s / binMicros) < maxSpanBins,
        sequence(floor(s / binMicros), floor(e / binMicros)))
        .otherwise(raise_error(concat(
          lit(s"intervalJoin interval inverted or spanning >= $maxSpanBins " +
            s"bins of $binMicros us; fix the interval or raise " +
            "binMicros/maxSpanBins — "),
          s.cast("string"), lit(".."), e.cast("string"))))
      df.select(df.columns.map(c => col(c).as(s"${prefix}_$c")): _*)
        .withColumn(s"${prefix}_bin", explode(guard))
    }
    val ea = explodeBins(a, "a")
    val eb = explodeBins(b, "b")
    val aS = col(s"a_$startCol"); val aE = col(s"a_$endCol")
    val bS = col(s"b_$startCol"); val bE = col(s"b_$endCol")
    val joinCond = key match {
      case Some(k) => col("a_bin") === col("b_bin") &&
        col(s"a_$k") === col(s"b_$k")
      case None => col("a_bin") === col("b_bin")
    }
    ea.join(eb, joinCond)
      // closed-interval overlap, deduped to the pair's unique meeting bin
      .filter(aS <= bE && bS <= aE &&
        col("a_bin") === greatest(floor(aS / binMicros), floor(bS / binMicros)))
      .withColumn("overlap_us", least(aE, bE) - greatest(aS, bS))
      .drop("a_bin", "b_bin")
  }

  def rangeJoin(points: DataFrame, ptTs: String,
                intervals: DataFrame, startCol: String, endCol: String,
                key: Option[String], binMicros: Long,
                maxSpanBins: Int = 1024): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val p = points.withColumn("_bin", floor(col(ptTs) / binMicros))
    val spanGuard = when(
      col(endCol) >= col(startCol) &&
        floor(col(endCol) / binMicros) - floor(col(startCol) / binMicros)
          < maxSpanBins,
      sequence(floor(col(startCol) / binMicros),
        floor(col(endCol) / binMicros)))
      .otherwise(raise_error(concat(
        lit(s"rangeJoin interval inverted or spanning >= $maxSpanBins bins" +
          s" of $binMicros us; fix the interval or raise " +
          "binMicros/maxSpanBins — "),
        col(startCol).cast("string"), lit(".."), col(endCol).cast("string"))))
    val i = intervals.withColumn("_bin", explode(spanGuard))
    val joinCond = key match {
      case Some(k) => p("_bin") === i("_bin") && p(k) === i(k)
      case None => p("_bin") === i("_bin")
    }
    p.join(i, joinCond)
      .filter(p(ptTs) >= i(startCol) && p(ptTs) < i(endCol))
      .drop("_bin")
  }
}
