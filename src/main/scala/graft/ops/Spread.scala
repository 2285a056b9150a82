package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism guard for per-row-HEAVY operators (tokenize + shingle +
 * hash pipelines, PNG/zlib codecs, per-row vector folds): when the
 * upstream scan produced fewer partitions than the session has cores —
 * the "one huge unsplittable file" input-skew case of guide §2.5, which
 * at bench scale is literally a sub-`maxPartitionBytes` single-file table
 * (documents.parquet: one row group → ONE task, 1/32 of the box) — spread
 * the rows round-robin across the default parallelism before the heavy
 * expression runs.
 *
 * Scale behavior: at 100 TB every table is thousands of files and the
 * scan already carries ≥ cores partitions, so the condition is false and
 * this is a literal no-op — no shuffle, no plan change. It only fires
 * when the scan CANNOT use the machine, where one extra pass over the
 * (by construction small) input buys cores× on the dominant per-row
 * stage. Round-robin repartition is retry-safe (sort-before-repartition,
 * SPARK-23207 — on by default) and multiset-preserving, so any
 * aggregation/ordering downstream is unchanged; callers below it compute
 * per-row or order-free (integer / value-ordered) aggregates only.
 */
object Spread {
  def perRowHeavy(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // queryExecution.toRdd: the partition count off THIS df's own (cached)
    // QueryExecution — df.rdd built a second full QueryExecution (analysis
    // + physical planning) plus a deserializer lineage per probe, pure
    // driver overhead at ~20 hot operator entries (round-11 ADVICE)
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
