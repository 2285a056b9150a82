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
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    var level: DataFrame = null
    val counts = steps.zipWithIndex.map { case (step, i) =>
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      level =
        if (level == null)
          stepEvents.groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
        else stepEvents
          .join(level.select(col("_u"), col("_t").as("_prev")), "_u")
          .filter(col("_ts") > col("_prev"))
          .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
      level.agg(count(lit(1)).as("users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("users"))
    }
    counts.reduceLeft(_ union _)
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
    // integer `div`, not double `/`+floor: epoch micros sit near the top of
    // double's exact-integer range and the quotient must replay bit-exactly
    val weeks = events
      .select(col(userCol).as("_u"), col(tsUsCol).cast("long").as("_ts"))
      .select(col("_u"), expr(s"_ts div ${weekMicros}L").as("week"))
      .distinct()
    val cohort = weeks.groupBy(col("_u"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, "_u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
