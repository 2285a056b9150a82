package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) storage layout: bit-interleave k key columns
 * (two in [[zValue]]/[[write]], any k in [[zValueN]]/[[writeN]]) into one
 * z-value, range-partition + sort on it, write parquet. Each
 * output file then covers a small axis-aligned box of the key
 * space, so parquet min/max footer stats prune selective scans on ANY
 * key column — the multi-dimensional complement to [[RangeLayout]] (whose
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

  /** k-dimensional Morton z-value: bit j of the i-th level comes from
    * column j, landing at position k·i + j (later columns above earlier
    * ones at each level — the 2-column [[zValue]] is the k = 2 case).
    * Same truncation contract per column; k·bits must fit a positive
    * long (≤ 63). Three tenant × source × time dimensions at 21 bits
    * each is the practical ceiling; more dimensions want fewer bits
    * (locality per axis degrades as k grows — the curve has 63 bits of
    * budget to split). */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"need >= 2 columns to interleave, got $k")
    require(bits >= 1 && k * bits <= 63,
      s"k*bits must be in [1, 63], got $k * $bits")
    val longs = cols.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), k * i + j)
      }
    }.reduceLeft(_ bitwiseOR _)
  }

  /** `validate = true` adds a debug write-path check (one extra aggregate
    * pass) that both keys lie in [0, 2^bits): out-of-domain keys would
    * otherwise alias on the curve and silently destroy the clustering —
    * see [[zValue]]'s truncation contract. */
  def write(df: DataFrame, path: String, colA: String, colB: String,
            partitions: Int, bits: Int = 21,
            validate: Boolean = false): Unit =
    writeN(df, path, Seq(colA, colB), partitions, bits, validate)

  /** k-column z-order write — [[write]] generalized via [[zValueN]];
    * the 2-column bit layout is preserved exactly (b above a per level). */
  def writeN(df: DataFrame, path: String, cols: Seq[String],
             partitions: Int, bits: Int = 21,
             validate: Boolean = false): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    if (validate) {
      val lim = 1L << bits
      val aggs = cols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"_min_$c"),
        max(col(c).cast("long")).as(s"_max_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      // Each column's min/max pair is checked INDEPENDENTLY: an earlier
      // version skipped the whole check when any field was NULL, so one
      // all-NULL key column silently disabled validation for every other
      // column. min/max ignore NULLs, so a NULL min means the column has
      // NO non-null values at all — that's a hard failure too (NULL keys
      // interleave as garbage and destroy the clustering), not a skip.
      // An empty frame (every column NULL) is the one legitimate skip.
      val allNull = cols.indices.forall(i => r.isNullAt(2 * i))
      if (!allNull) {
        val bad = cols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1))
            Some(s"$c is all-NULL")
          else {
            val (mn, mx) = (r.getLong(2 * i), r.getLong(2 * i + 1))
            if (mn < 0 || mx >= lim) Some(s"$c in [$mn, $mx]") else None
          }
        }
        require(bad.isEmpty,
          s"z-order keys out of [0, 2^$bits): ${bad.mkString(", ")} — " +
            "keys >= 2^bits alias onto the low-bit curve, negative " +
            "keys interleave their sign bits, and all-NULL keys destroy " +
            "the clustering; remap/rank-encode first or raise `bits`")
      }
    }
    df.withColumn("_z", zValueN(cols.map(col), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z") // projection after the sort: order is preserved
      .write.mode("overwrite").parquet(path)
  }
}
