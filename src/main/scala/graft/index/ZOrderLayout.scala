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
    * bit, all inside whole-stage codegen; no UDF.
    *
    * TRUNCATION CONTRACT: only the low `bits` bits of each key are
    * interleaved — a key ≥ 2^bits silently ALIASES onto the low-bit curve
    * (x and x + 2^bits land on the same z). Pruning stays correct (footer
    * min/max are computed from the real column values), but the clustering
    * — the layout's whole purpose — silently degrades: aliased keys
    * scatter across files. Same for negative keys (the doc'd remap-first
    * requirement). Callers who can't prove their domain fits should pass
    * `validate = true` to [[write]], which spends one aggregate over the
    * two key columns to fail loudly instead. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_ bitwiseOR _)
  }

  /** `validate = true` adds a debug write-path check (one extra aggregate
    * pass) that both keys lie in [0, 2^bits): out-of-domain keys would
    * otherwise alias on the curve and silently destroy the clustering —
    * see [[zValue]]'s truncation contract. */
  def write(df: DataFrame, path: String, colA: String, colB: String,
            partitions: Int, bits: Int = 21,
            validate: Boolean = false): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    if (validate) {
      val lim = 1L << bits
      val r = df.agg(
        min(col(colA).cast("long")).as("mina"),
        max(col(colA).cast("long")).as("maxa"),
        min(col(colB).cast("long")).as("minb"),
        max(col(colB).cast("long")).as("maxb")).head()
      if (!r.anyNull) {
        val (mina, maxa, minb, maxb) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        require(mina >= 0 && minb >= 0 && maxa < lim && maxb < lim,
          s"z-order keys out of [0, 2^$bits): $colA in [$mina, $maxa], " +
            s"$colB in [$minb, $maxb] — keys >= 2^bits alias onto the " +
            "low-bit curve and negative keys interleave their sign bits; " +
            "remap/rank-encode first or raise `bits`")
      }
    }
    df.withColumn("_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z") // projection after the sort: order is preserved
      .write.mode("overwrite").parquet(path)
  }
}
