package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Range-sorted storage layout: `repartitionByRange` on the sort key, then
 * `sortWithinPartitions` before the parquet write. Each output file then
 * covers a DISJOINT key interval, so parquet's per-file and per-row-group
 * min/max statistics let a selective scan skip everything outside the
 * predicate's range — the complement to [[BucketedStore]] (hash layout for
 * shuffle-free equi-joins; range layout for pruned range scans). At 100 TB
 * this is the difference between a point lookup touching one file and
 * touching all of them; it is also the standard layout for event-time data
 * where queries carry time predicates.
 *
 * The layout is proven, not assumed: RangeLayoutSpec reads the written
 * files' parquet footers and asserts the per-file [min, max] key intervals
 * are pairwise disjoint, and that the same data written unsorted does NOT
 * have that property.
 *
 * Reference contract: the reference's stores index by key server-side
 * (graph store + vector store); for the file-backed path this is the
 * engine-side equivalent — organize what you write so reads prune.
 */
object RangeLayout {

  /** `bloomCols`: columns to write parquet bloom filters for — the
    * point-lookup complement to the min/max range pruning this layout
    * already buys. Range stats prune by interval; a bloom filter skips a
    * row group when an equality probe's key is definitely absent even
    * INSIDE the interval — the right tool for high-cardinality id columns
    * that the sort key doesn't cover. A few KB per row group; proven in
    * RangeLayoutSpec by reading the bloom offsets back out of the footer. */
  def write(df: DataFrame, path: String, sortCols: Seq[String],
            partitions: Int, bloomCols: Seq[String] = Nil): Unit = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val writer = df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(path)
  }
}
