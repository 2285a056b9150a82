package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over an append-only event log: ordered funnel
 * conversion and cohort retention — the two aggregate families a
 * training-data/product pipeline runs against its telemetry tables
 * alongside sessionization (graft.streaming.Sessionize). The reference's
 * events surface stops at windows/sessions; these extend it the way its
 * summary queries extend the graph surface (reference
 * lexical-graph query semantics: bounded, replayable aggregates).
 *
 * Scale shape (both): every shuffle keys on the user column, so the
 * per-user aggregate and each subsequent same-key join reuse ONE hash
 * partitioning — on a cluster the event table bucketed by user satisfies
 * the whole pass with a single exchange (or none). No window over the raw
 * event stream, no driver collect, map-side-combinable aggregates only.
 */
object EventAnalytics {

  /** FLOOR division of a BIGINT epoch column by a positive bucket width.
    * Spark's integer `div` truncates toward zero, but DuckDB's `//` (the
    * oracle semantics) and [[graft.ops.TemporalJoins]]'s `floor(a / b)`
    * bucketing both floor — for NEGATIVE epochs (pre-1970 timestamps) the
    * two disagree by one bucket, breaking oracle parity and cross-operator
    * bucket alignment. `(x − pmod(x, b)) div b` floors exactly in pure
    * BIGINT arithmetic (pmod is the non-negative remainder, so the
    * numerator is an exact multiple of b): no double rounding near 2^63,
    * same result as `div` for the non-negative common case. The one
    * unreachable edge: x within (bucket − 1) of Long.MinValue underflows —
    * ~292,000 years before 1970 at micros resolution. */
  private[ops] def floorDivBucket(xSql: String,
                                  bucket: Long): org.apache.spark.sql.Column =
    expr(s"(($xSql) - pmod(($xSql), ${bucket}L)) div ${bucket}L")

  /**
   * Ordered funnel: for each step i, the users whose earliest step-i event
   * falls STRICTLY AFTER their earliest qualifying step-(i-1) event (the
   * classic "first touch" funnel — re-orderings within a user's history
   * don't double-count). Returns one row per step:
   * (step_idx, step, users).
   *
   * Each level is one filtered per-user min aggregate joined to the
   * previous level's frame — all on the user key, so the join chain rides
   * one partitioning; level frames shrink monotonically, and AQE turns the
   * later joins into broadcasts for free once a level fits.
   */
  /** `maxGapMicros`: a conversion window — step i counts only when it
    * happens within the gap AFTER the user's step-(i−1) time (the
    * "converted within N days" form every funnel tool defaults to).
    * None = unbounded (the plain strictly-after funnel). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    maxGapMicros.foreach(g => require(g > 0, s"non-positive gap $g"))
    var level: DataFrame = null
    val counts = steps.zipWithIndex.map { case (step, i) =>
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      level =
        if (level == null)
          stepEvents.groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
        else {
          val inWindow = maxGapMicros
            .map(g => col("_ts") > col("_prev") &&
              col("_ts") <= col("_prev") + g)
            .getOrElse(col("_ts") > col("_prev"))
          stepEvents
            .join(level.select(col("_u"), col("_t").as("_prev")), "_u")
            .filter(inWindow)
            .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
        }
      level.agg(count(lit(1)).as("users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("users"))
    }
    counts.reduceLeft(_ union _)
  }

  /**
   * Forward fill (last-observation-carried-forward): per key, each row's
   * NULL `valueCol` is replaced by the latest non-null value at-or-before
   * it in `tsCol` order — the gap-filling step sparse telemetry and
   * slowly-changing attributes need before joining onto a dense axis.
   * ONE key-partitioned running window (`last` with ignoreNulls over an
   * unbounded-preceding frame), the same single-shuffle shape as
   * [[graft.ops.TemporalJoins.asofJoin]]; rows before a key's first
   * observation stay NULL. `tieBreak` must make the order total.
   */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String,
                  tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    df.withColumn(valueCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /**
   * IQR outlier detection on a numeric column per type: rows outside
   * [q1 − factor·IQR, q3 + factor·IQR] (Tukey's fences, factor 1.5 —
   * the box-plot rule every data-quality sweep starts from). Returns the
   * outlier rows (id, type, value, side). Exact percentiles for the
   * oracle gate (Spark `percentile` ≡ DuckDB quantile_cont, the
   * lengthQuantiles parity); the per-type bounds frame is |types| rows
   * and broadcasts, so the detection pass is one codegen'd scan.
   */
  def iqrOutliers(events: DataFrame, typeCol: String, valueCol: String,
                  idCol: String, factor: Double = 1.5): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    val q = events.groupBy(col(typeCol).as("type"))
      .agg(percentile(col(valueCol), typedlit(Seq(0.25, 0.75))).as("_q"))
      .select(col("type"), element_at(col("_q"), 1).as("_q1"),
        element_at(col("_q"), 2).as("_q3"))
    val iqr = col("_q3") - col("_q1")
    val lo = col("_q1") - lit(factor) * iqr
    val hi = col("_q3") + lit(factor) * iqr
    events.select(col(idCol).as("id"), col(typeCol).as("type"),
        col(valueCol).as("value"))
      .join(broadcast(q), "type")
      .filter(col("value") < lo || col("value") > hi)
      .select(col("id"), col("type"), col("value"),
        when(col("value") < lo, lit("low")).otherwise(lit("high"))
          .as("side"))
  }

  /**
   * Weekly cohort retention: users are cohorted by the week of their FIRST
   * event; for each (cohort_week, week_offset) the count of cohort users
   * active in that later week. Returns
   * (cohort_week, week_offset, users) — the standard retention triangle.
   *
   * Two aggregates + one join, all user-keyed; the per-(user, week)
   * distinct is a map-side-combinable aggregate, and after it each
   * (user, week) row is unique so the final count needs no distinct.
   * `weekMicros` parameterizes the bucket (days/weeks/months) without
   * calendar functions — epoch-integer division replays bit-exactly in
   * any engine.
   */
  def retentionCohorts(events: DataFrame, userCol: String, tsUsCol: String,
                       weekMicros: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    require(weekMicros > 0, s"weekMicros must be positive, got $weekMicros")
    // integer floor-division, not double `/`+floor: epoch micros sit near
    // the top of double's exact-integer range and the quotient must replay
    // bit-exactly ([[floorDivBucket]] for why not plain `div`)
    val weeks = events
      .select(col(userCol).as("_u"), col(tsUsCol).cast("long").as("_ts"))
      .select(col("_u"), floorDivBucket("_ts", weekMicros).as("week"))
      .distinct()
    val cohort = weeks.groupBy(col("_u"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, "_u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /**
   * Event-type transition matrix (first-order Markov estimate): counts of
   * consecutive (from → to) event-type pairs within each user's
   * time-ordered history, with the per-from transition probability in
   * micro-units — the next-action model behind session simulation and
   * funnel design. Returns (from_type, to_type, n, n_from, p_micro).
   *
   * One user-keyed window (the sessionize shuffle) feeds a map-side-
   * combinable pair count; the probability normalizer is a window over
   * the |types|² COUNTS frame, so nothing after the first shuffle scales
   * with the event volume. p_micro = round(1e6·n/n_from) from exact
   * BIGINTs — bit-exact in any IEEE engine.
   */
  def transitions(events: DataFrame, userCol: String, tsUsCol: String,
                  typeCol: String,
                  tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy((tsUsCol +: tieBreak).map(col): _*)
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    pairs
      .withColumn("n_from", sum(col("n")).over(wf))
      .withColumn("p_micro",
        round(lit(1000000.0) * col("n") / col("n_from")).cast("long"))
  }

  /**
   * Trailing-window rate anomalies: bucket events per (type, bucket),
   * then score each bucket's count against the mean/stddev of the
   * PRECEDING `trailing` observed buckets of the same type — the
   * volume-spike/drop monitor a pipeline runs over its telemetry before
   * trusting a day's data. Returns
   * (type, bucket, n_events, n_prev, z_micro) for buckets with at least
   * `minPrev` history; z_micro = round(1e6·(x−μ)/σ), NULL when σ = 0.
   *
   * Determinism/scale shape: the bucket aggregate is map-side
   * combinable; the window runs over the (type, bucket) COUNTS frame —
   * buckets per type, not events — so the sort is tiny at any event
   * volume. μ and σ derive from exact integer window sums (Σx in BIGINT;
   * Σx² and the variance numerator in DECIMAL(38,0), which keeps the
   * arithmetic exact up to ~10¹⁸ events per bucket instead of silently
   * wrapping int64 near 3·10⁹ — see [[scoreTrailing]]), fixed-order IEEE
   * ops from there, so the score replays bit-exactly
   * in SQL. Empty buckets are absent, not zero: the trailing stats are
   * over OBSERVED buckets (document the gap semantics to callers).
   */
  def rateAnomalies(events: DataFrame, typeCol: String, tsUsCol: String,
                    bucketMicros: Long, trailing: Int,
                    minPrev: Int = 5): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    val counts = events
      .select(col(typeCol).as("type"),
        floorDivBucket(s"CAST($tsUsCol AS BIGINT)", bucketMicros).as("bucket"))
      .groupBy(col("type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"))
    scoreTrailing(counts, trailing, minPrev)
  }

  /**
   * The scoring half of [[rateAnomalies]], factored out so a STREAMING
   * count source can feed it (graft.streaming.StreamingAnomalies emits
   * the same (type, bucket, n_events) shape from a watermarked window
   * aggregate). Only the bucket ORDER matters, so bucket indexes and
   * epoch-micros window starts both work.
   */
  def scoreTrailing(counts: DataFrame, trailing: Int,
                    minPrev: Int = 5): DataFrame = {
    require(trailing >= 1, s"trailing must be >= 1, got $trailing")
    require(minPrev >= 2, s"minPrev must be >= 2, got $minPrev")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("type")).orderBy(col("bucket"))
      .rowsBetween(-trailing, -1)
    // Σx² accumulates in DECIMAL(38,0) — x² for a 3·10⁹-event bucket is
    // already 9e18 ≈ int64 max, so a BIGINT Σx² wraps before the variance
    // numerator below even gets a say. DuckDB's sum(BIGINT) widens to
    // HUGEINT for the same reason; decimal is Spark's exact-arithmetic
    // analogue and hashes identically once cast to double in range.
    val scored = counts
      .withColumn("n_prev", count(col("n_events")).over(w))
      .withColumn("_s", sum(col("n_events")).over(w))
      .withColumn("_s2", sum(col("n_events").cast("decimal(38,0)")
        * col("n_events")).over(w))
    // σ² via the exact-integer numerator (n·Σx² − (Σx)²)/n²: one double
    // division + one sqrt, both IEEE-exact given exact integer inputs.
    // The numerator is computed in DECIMAL(38,0), not BIGINT: with
    // per-bucket counts x and window length t, n·Σx² can reach t²·x² —
    // ~6e8 events/bucket at trailing=24 already wraps int64 silently,
    // yielding a negative "variance" and bogus z-scores. DECIMAL(38,0)
    // holds counts up to ~1.3e18/t with exact arithmetic; the cast to
    // double afterwards rounds identically to the BIGINT path whenever
    // the BIGINT path wouldn't have overflowed, so small-scale oracle
    // replays are unchanged and huge-volume buckets now score correctly
    // instead of wrapping.
    val n = col("n_prev").cast("double")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val varNum = (dec(col("n_prev")) * dec(col("_s2"))
      - dec(col("_s")) * dec(col("_s"))).cast("double")
    val sigma = sqrt(varNum / (n * n))
    val mean = col("_s").cast("double") / n
    scored
      .filter(col("n_prev") >= minPrev)
      .withColumn("z_micro",
        when(sigma > 0.0,
          round(lit(1000000.0) * (col("n_events").cast("double") - mean)
            / sigma).cast("long")))
      .select(col("type"), col("bucket"), col("n_events"), col("n_prev"),
        col("z_micro"))
  }

  /**
   * Interval occupancy (concurrency profile): given an interval frame
   * (e.g. [[graft.streaming.Sessionize.batchSessions]] output), the number
   * of intervals active in each time bucket — "how many sessions were
   * live each hour", the load curve behind capacity planning and
   * anomaly review. An interval [start, end] (epoch micros, inclusive
   * ends as sessionize emits them) occupies every bucket its integer-
   * divided endpoints span. Returns (bucket, bucket_start_us, active).
   *
   * Scale shape: ONE explode + one map-side-combinable count — the
   * classic sweep-line turned into a bucketed scan, no self-join. Output
   * rows per interval = its span in buckets, so like
   * [[graft.ops.TemporalJoins.rangeJoin]] a span wider than
   * `maxSpanBuckets` fails loudly (raise_error in the plan, caught at
   * the first offending row, not after an executor OOM): pick
   * `bucketMicros` near the typical interval length.
   */
  def occupancy(intervals: DataFrame, startCol: String, endCol: String,
                bucketMicros: Long, maxSpanBuckets: Int = 4096): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    require(maxSpanBuckets >= 1,
      s"maxSpanBuckets must be >= 1, got $maxSpanBuckets")
    val b0 = floorDivBucket(s"CAST($startCol AS BIGINT)", bucketMicros)
    val b1 = floorDivBucket(s"CAST($endCol AS BIGINT)", bucketMicros)
    // b1 >= b0 is part of the guard: an inverted interval (end < start)
    // would make sequence() DESCEND and silently emit wrong buckets
    val spanGuard = when(b1 >= b0 && b1 - b0 < maxSpanBuckets,
      sequence(b0, b1))
      .otherwise(raise_error(concat(
        lit(s"occupancy interval inverted or spanning >= $maxSpanBuckets " +
          s"buckets of $bucketMicros us; fix the interval or raise " +
          "bucketMicros/maxSpanBuckets — "),
        col(startCol).cast("string"), lit(".."),
        col(endCol).cast("string"))))
    intervals
      .select(explode(spanGuard).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("active"))
      .withColumn("bucket_start_us", col("bucket") * bucketMicros)
  }
}
