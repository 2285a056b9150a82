package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Schemas

/**
 * SCD-2 version interval maintenance for re-ingested sources
 * (reference: indexing/build/version_manager.py:73-155 — on re-ingest, the
 * new version's arrival closes the previous version's `valid_to`).
 *
 * One window per version-independent id; at scale this is a single shuffle
 * on the vid key, and vids are high-cardinality so there is no skew concern.
 */
object VersionManager {

  /** Close intervals: valid_to = next newer version's valid_from, sentinel
    * upper bound for the live version. `tieBreak` makes the order total when
    * two versions share a valid_from. */
  def mergeVersions(all: DataFrame, vidCols: Seq[String],
                    validFromCol: String = "valid_from",
                    tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (validFromCol +: tieBreak).map(col)
    val w = Window.partitionBy(vidCols.map(col): _*).orderBy(order: _*)
    all.withColumn("valid_to",
      coalesce(lead(col(validFromCol), 1).over(w),
        lit(Schemas.TimestampUpperBound)))
  }

  /** Latest live version per vid (reference version_manager.py latest scan:
    * ORDER BY valid_from DESC rank 1). */
  def latestVersions(all: DataFrame, vidCols: Seq[String],
                     validFromCol: String = "valid_from",
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val order = desc(validFromCol) +: tieBreak.map(c => desc(c))
    val w = Window.partitionBy(vidCols.map(col): _*).orderBy(order: _*)
    all.withColumn("version_rank", row_number().over(w))
      .filter(col("version_rank") === 1)
      .drop("version_rank")
  }

  /**
   * Retention GC (the SCD-2 store's VACUUM): over a merged version frame
   * ([[mergeVersions]] output), drop every version fully superseded at or
   * before `watermark` — i.e. rows with `valid_to <= watermark`, which no
   * as-of read at T ≥ watermark can ever return. The version visible AT
   * the watermark survives (its interval straddles it), as does all later
   * history, so every supported time-travel query after GC answers
   * identically.
   *
   * A pure per-row predicate — no shuffle at all; on a valid_to-partitioned
   * store this is partition-pruned file deletion, the cheapest possible
   * maintenance pass at 100 TB (Delta/Iceberg VACUUM semantics applied to
   * the interval representation).
   */
  def gcVersions(merged: DataFrame, watermark: Long,
                 validToCol: String = "valid_to"): DataFrame =
    merged.filter(col(validToCol) > watermark)

  /**
   * Diff two point-in-time snapshots of a versioned table in ONE hash
   * aggregate — no self-join, no window. Per vid the active version at a
   * time T is the one with the largest `valid_from <= T`; both snapshots
   * resolve in the same pass via two conditional `max_by` slots (null
   * ordering keys — rows newer than T — are skipped by `max_by`, matching
   * DuckDB `arg_max`). Classification then reads the two slots:
   *
   *   - `added`:   absent (or tombstoned) at t1, live at t2
   *   - `removed`: live at t1, tombstoned at t2
   *   - `changed`: live at both with different payloads
   *
   * Unchanged and never-present vids are dropped. Rows whose latest
   * version at t2 is a tombstone AND which were absent at t1 never
   * surface (created+deleted inside the window).
   *
   * At scale this is the shape you want for a 100 TB changelog: the only
   * shuffle is the aggregate on the high-cardinality vid key with map-side
   * partials; payload equality is checked post-aggregate on two scalar
   * slots. `valid_from` must be unique per vid (the SCD-2 invariant
   * [[mergeVersions]] establishes with its tieBreak).
   *
   * Reference contract: version_manager.py's interval scans answer
   * "state as of T"; this derives "what changed between T1 and T2",
   * the incremental-rebuild question the reference answers by re-reading
   * both snapshots.
   */
  def snapshotDiff(versions: DataFrame, vidCols: Seq[String],
                   validFromCol: String, payloadCol: String,
                   t1: Long, t2: Long,
                   tombstoneCol: Option[String] = None): DataFrame = {
    require(t1 <= t2, s"snapshotDiff expects t1 <= t2, got $t1 > $t2 — " +
      "swap the arguments (the change classes are directional)")
    val vf = col(validFromCol)
    // coalesce: CDC feeds commonly encode "not deleted" as NULL; a null
    // tombstone must read as live, not poison every classification branch
    val del = tombstoneCol.map(c => coalesce(col(c), lit(false)))
      .getOrElse(lit(false))
    // slot = latest (payload, tombstone) at-or-before T; null if none.
    def slot(t: Long) = max_by(
      struct(col(payloadCol).as("payload"), del.as("del")),
      when(vf <= lit(t), vf))
    val agg = versions.groupBy(vidCols.map(col): _*)
      .agg(slot(t1).as("s1"), slot(t2).as("s2"))
    val live1 = col("s1").isNotNull && !col("s1.del")
    val live2 = col("s2").isNotNull && !col("s2.del")
    // null-safe inequality: a payload transitioning NULL <-> value is a
    // real change; plain =!= would evaluate NULL and silently drop it
    agg.withColumn("change",
        when(!live1 && live2, lit("added"))
          .when(live1 && !live2, lit("removed"))
          .when(live1 && live2 &&
            !(col("s1.payload") <=> col("s2.payload")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(vidCols.map(col) ++ Seq(col("change"),
        when(live1, col("s1.payload")).as("old_payload"),
        when(live2, col("s2.payload")).as("new_payload")): _*)
  }
}
