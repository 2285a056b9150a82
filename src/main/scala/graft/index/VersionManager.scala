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
}
