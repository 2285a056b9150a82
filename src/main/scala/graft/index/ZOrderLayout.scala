package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) storage layout: bit-interleave TWO key columns
 * into one z-value, range-partition + sort on it, write parquet. Each
 * output file then covers a small axis-aligned rectangle of the (a, b) key
 * space, so parquet min/max footer stats prune selective scans on EITHER
 * column — the multi-dimensional complement to [[RangeLayout]] (whose
 * single sort key prunes only itself: every file spans the full range of
 * the second column). At 100 TB this is the standard layout for tables
 * queried by two independent dimensions (tenant × time, source × key):
 * one physical order serves both predicate families.
 *
 * Like RangeLayout, the property is proven, not assumed: ZOrderLayoutSpec
 * reads the written footers and asserts BOTH columns' per-file intervals
 * are fractions of the domain (and prune a point predicate), while a
 * single-column range layout prunes only its own sort column.
 *
 * Keys must be non-negative (bit interleaving maps sign bits into the
 * middle of the curve); remap/rank-encode first if a key can be negative.
 */
object ZOrderLayout {

  /** Morton z-value of two non-negative integral columns, `bits` bits each
    * (b's bits land above a's at each level). Pure Column math — ~3 ops per
    * bit, all inside whole-stage codegen; no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_ bitwiseOR _)
  }

  def write(df: DataFrame, path: String, colA: String, colB: String,
            partitions: Int, bits: Int = 21): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    df.withColumn("_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z") // projection after the sort: order is preserved
      .write.mode("overwrite").parquet(path)
  }
}
