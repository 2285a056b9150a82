package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Completeness proof for the prefix-filtered set-similarity join: on a
  * deterministic pseudo-random corpus the result must EQUAL the brute-force
  * all-pairs join — the prefix filter may only prune, never lose. */
class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 40 docs over a tiny vocabulary, with planted
  // near-duplicate pairs (doc 2k+1 = doc 2k with a word changed) so the
  // threshold actually selects something
  private lazy val docs = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until 40).map { i =>
      val base = (0 until 12).map(j => vocab((i / 2 * 7 + j * 3) % vocab.size))
      val words = if (i % 2 == 1) base.updated(5, vocab((i + 3) % vocab.size))
                  else base
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def brute(tau: Double): Set[(Long, Long, Int, Int)] = {
    graft.functions.WordShingles.register(spark)
    val sh = docs.select(col("doc_id"),
      graft.functions.WordShingles.shingles(col("text"), 3).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("inter"),
        size(array_union(col("a.sh"), col("b.sh"))).as("uni"))
      .filter(col("inter").cast("double") >= lit(tau) * col("uni").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3))).toSet
  }

  test("prefix-filtered join equals brute force at several thresholds") {
    Seq(0.3, 0.5, 0.8).foreach { tau =>
      val got = Dedup.setSimilarityJoin(docs, "text", "doc_id", tau)
        .select("id_a", "id_b", "inter", "uni")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3))).toSet
      val want = brute(tau)
      assert(got === want, s"tau=$tau: prefix filter lost or invented pairs")
      assert(want.nonEmpty, s"tau=$tau: degenerate fixture (no pairs)")
    }
  }

  test("tau=1.0 finds exactly the planted identical pairs") {
    val ident = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "q r s t u"))
      .toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(ident, "text", "doc_id", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L)))
  }

  test("rejects out-of-range tau") {
    intercept[IllegalArgumentException] {
      Dedup.setSimilarityJoin(docs, "text", "doc_id", 0.0)
    }
  }

  test("containmentJoin catches small-in-big quotes Jaccard misses") {
    // bench doc fully quoted inside a 10x larger corpus doc
    val quote = "the quick brown fox jumps over the lazy dog"
    val pad = (1 to 60).map(i => s"filler$i word$i").mkString(" ")
    val corpus = Seq((100L, s"$pad $quote $pad"), (101L, pad))
      .toDF("doc_id", "text")
    val bench = Seq((1L, quote)).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(corpus, "text", "doc_id",
        bench, "text", "doc_id", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.toSeq === Seq((100L, 1L, 1.0)))
    // …whereas symmetric Jaccard on the same pair is far below 0.9
    val jac = Dedup.setSimilarityJoin(
      corpus.union(bench.select(col("doc_id"), col("text"))),
      "text", "doc_id", 0.9)
    assert(jac.filter(col("id_a") === 1L || col("id_b") === 1L).count() === 0)
  }

  test("containmentJoin scores partial overlap exactly") {
    // bench has 4 tokens -> 2 distinct 3-shingles; corpus shares 1 of 2
    val bench = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq((2L, "x y a b c z")).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(corpus, "text", "doc_id",
        bench, "text", "doc_id", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((2L, 1L, 1L, 2L))) // shares "a b c" of {a b c, b c d}
  }
}
