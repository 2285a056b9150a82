package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Persisted-sketch incremental analytics: unioning per-batch HLL
  * sketches through a parquet round-trip must track the whole-corpus
  * estimate and the exact distinct count within the sketch error bound
  * (bit-equality does NOT hold — DataSketches HIP is order-sensitive). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map { i =>
    (s"src${i % 3}", s"token$i shared common t${i % 50} filler word$i")
  }.toDF("source", "text")

  test("per-batch sketch union == whole-corpus sketch, through parquet") {
    val all = docs(0 until 400)
    val batch1 = docs(0 until 250)
    val batch2 = docs(250 until 400)
    val dir = Files.createTempDirectory("sk").toString
    Sketches.tokenSketches(batch1, "text", "source")
      .write.parquet(s"$dir/b1")
    Sketches.tokenSketches(batch2, "text", "source")
      .write.parquet(s"$dir/b2")
    val persisted = spark.read.parquet(s"$dir/b1")
      .unionByName(spark.read.parquet(s"$dir/b2"))
    val incr = Sketches.mergeSketches(persisted)
      .as[(Long, Long)].head()
    val whole = Sketches.mergeSketches(
      Sketches.tokenSketches(all, "text", "source"))
      .as[(Long, Long)].head()
    assert(incr._1 == whole._1)
    val exact = all.select(explode(
        graft.functions.WordGrams.grams(col("text"), 1)).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    // both paths inside the lgK=12 error bound of the exact count, and
    // of each other; re-merging the same persisted rows is deterministic
    assert(math.abs(incr._2 - exact).toDouble / exact < 0.05,
      s"incremental ${incr._2} vs exact $exact")
    assert(math.abs(whole._2 - exact).toDouble / exact < 0.05,
      s"whole ${whole._2} vs exact $exact")
    assert(math.abs(incr._2 - whole._2).toDouble / exact < 0.02)
    assert(Sketches.mergeSketches(persisted).as[(Long, Long)].head() == incr)
    // per-key rows: one sketch per source, mergeable per slice too
    val perKey = persisted.groupBy(col("k"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
    assert(perKey.count() == 3L)
  }
}
