package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/**
 * Skew-resilient joins (the 100 TB story, SURVEY.md §4 spill/shuffle row):
 * when a join key is heavily skewed (one entity mentioned in millions of
 * statements), a plain shuffle join funnels the hot key through one task.
 * Salting scatters the big side across `salt` sub-keys and replicates the
 * small side once per sub-key, so the hot key's rows spread over `salt`
 * tasks. AQE's skew-join handles sort-merge cases adaptively; this explicit
 * form covers aggregations and joins where the salt must survive into
 * downstream grouping.
 */
object Skew {

  /**
   * Salted inner equi-join on `key`: big side salted deterministically by
   * spreading rows across `salt` buckets, small side exploded `salt` ways.
   * Result equals `big.join(small, key)` row-for-row.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    requireDistinguishing(big, key, "saltedJoin")
    // content-hash scatter: the salt is a pure function of the row, so the
    // assignment is identical under any partition layout — salted
    // intermediates stay oracle-replayable. Exact duplicate rows share a
    // bucket (they hash alike); skew relief comes from spreading the hot
    // key's DISTINCT rows, which is the realistic shape (same entity,
    // different statements) — the guard above refuses the degenerate frame
    // where no distinguishing column exists at all.
    val salted = big.withColumn("_salt", contentSalt(big, salt))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Layout-independent salt in [0, salt): xxhash64 over every hashable
    * column — a pure row function, so repartitioning never changes the
    * assignment. Map-typed columns (this repo's `metadata` columns) are
    * excluded: Spark's hash functions reject MapType (unordered entries
    * have no canonical hash), and xxhash64 would throw AnalysisException. */
  def contentSalt(df: DataFrame, salt: Int): Column = {
    val hashable = df.schema.fields.filterNot(f => containsMap(f.dataType))
    require(hashable.nonEmpty,
      "contentSalt: frame has no non-map column to derive a deterministic " +
        "salt from")
    pmod(xxhash64(hashable.toIndexedSeq.map(f => col(f.name)): _*), lit(salt.toLong))
  }

  /**
   * Two-phase (salted partial, then final) count aggregation per key —
   * the map-side-combine shape made explicit for skewed groupBys whose
   * per-key state is large (collect_set and friends).
   */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    requireDistinguishing(df, key, "saltedCount")
    df.withColumn("_salt", contentSalt(df, salt))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("count"))
  }

  /** The content salt can only spread a hot key if some non-map column
    * besides the key distinguishes its rows; a key-only (or key+maps-only)
    * frame would hash every duplicate of the hot key into ONE bucket,
    * silently defeating the skew relief these helpers exist to provide —
    * refuse it loudly instead. */
  private def requireDistinguishing(df: DataFrame, key: String,
                                    op: String): Unit = {
    val others = df.schema.fields
      .filter(f => f.name != key && !containsMap(f.dataType))
    require(others.nonEmpty,
      s"$op: no non-map column besides key '$key' — every duplicate of a " +
        "hot key would land in one salt bucket. Add a row-distinguishing " +
        "column (id, offset) before salting")
  }

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType      => true
    case ArrayType(e, _) => containsMap(e)
    case s: StructType   => s.fields.exists(f => containsMap(f.dataType))
    case _               => false
  }
}
