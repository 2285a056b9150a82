package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.ops.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE QUICK  BROWN FOX jumps over the lazy dog!!"), // same after norm
    (3L, "a completely different document about spark sql engines"),
    (4L, "the quick brown fox jumps over the lazy cat")) // near-dup of 1
    .toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts the group") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("yieldReport counts canonical survivors in their OWN group") {
    // "a" appears in s1 twice and s2 once; the min-id winner (1) sits in
    // s1, so s2's copy is a duplicate even though s2 has no internal dup
    val d = Seq((1L, "a", "s1"), (2L, "a", "s1"), (3L, "b", "s1"),
      (4L, "a", "s2"), (5L, "c", "s2")).toDF("doc_id", "text", "source")
    val out = Dedup.yieldReport(d, "text", "doc_id", "source")
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("s1", 3L, 2L, math.round(1000000.0 / 3)),
      ("s2", 2L, 1L, 500000L)))
    // global invariant: Σ n_canonical == distinct normalized texts
    assert(out.map(_._3).sum === 3L)
  }

  test("minhash LSH finds the normalized duplicate with jaccard 1.0") {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", 16, 8, 3)
      .as[(Long, Long, Double)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 == 1.0)
  }

  test("diversityFilter drops the later id of each too-similar pair") {
    val kept = Dedup.diversityFilter(docs, "text", "doc_id", threshold = 0.5)
      .as[Long].collect().sorted
    // 2 is an exact dup of 1 (jaccard 1.0); 4 is a near-dup above 0.5;
    // both drop, the earliest id and the distinct doc survive
    assert(kept.toSeq == Seq(1L, 3L))
    // at an unreachable threshold nothing drops
    val all = Dedup.diversityFilter(docs, "text", "doc_id", threshold = 1.1)
      .as[Long].collect().sorted
    assert(all.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("diversityFilterTfidf matches sklearn-style brute force (exact " +
    "AllPairs prefix filter, NUM_/FLOAT_ placeholders, strict >)") {
    // near-identical pairs around the 0.975 default + numeric placeholder
    // behavior: "3.5" and "42" tokens map to FLOAT_/NUM_ terms
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (4L, "completely different words about spark plans"),
      (5L, "price 3.5 and count 42 of items"),
      (6L, "price 3.5 and count 42 of items")) // exact dup of 5
      .toDF("doc_id", "text")
    // brute force twin (driver-side): same tokenization + tfidf math
    def toks(s: String): Seq[String] =
      raw"\d+\.\d+|[a-z0-9]+".r.findAllIn(s.toLowerCase).toSeq.map {
        case t if t.matches(raw"\d+\.\d+") => s"FLOAT_$t"
        case t if t.matches(raw"\d+") => s"NUM_$t"
        case t => t
      }
    val texts = d.collect().map(r => r.getLong(0) -> toks(r.getString(1)))
    val n = texts.length.toDouble
    val dfreq = texts.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, g) => t -> g.length.toDouble }
    def vecOf(ts: Seq[String]): Map[String, Double] = {
      val tf = ts.groupBy(identity).map { case (t, g) =>
        t -> g.length * (math.log((n + 1) / (dfreq(t) + 1)) + 1) }
      val nm = math.sqrt(tf.values.map(x => x * x).sum)
      tf.map { case (t, w) => t -> w / nm }
    }
    val vecs = texts.map { case (id, ts) => id -> vecOf(ts) }.toMap
    def cos(a: Long, b: Long): Double =
      vecs(a).keySet.intersect(vecs(b).keySet).toSeq
        .map(t => vecs(a)(t) * vecs(b)(t)).sum
    val ids = texts.map(_._1)
    val dominated = (for {
      a <- ids; b <- ids if a < b && cos(a, b) > 0.975
    } yield b).toSet
    val expect = ids.filterNot(dominated).toSet
    val kept = graft.ops.Dedup
      .diversityFilterTfidf(d, "text", "doc_id")
      .as[Long].collect().toSet
    assert(kept == expect, s"kept=$kept expect=$expect")
    assert(!kept.contains(3L) && !kept.contains(6L)) // exact dups drop
    assert(kept.contains(4L)) // the distinct doc survives
    // the near-dup pair 1/2 sits BELOW 0.975 (1 token of 8 differs) —
    // strict-threshold behavior, both kept
    assert(cos(1L, 2L) < 0.975 && kept.contains(2L))
  }

  test("diversityFilterTfidf: all four verify regimes agree (BNLJ semi, " +
    "dense candidates, sparse-map candidates, postings join)") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "completely different words about spark plans"),
      (5L, "price 3.5 and count 42 of items"),
      (6L, "price 3.5 and count 42 of items"))
      .toDF("doc_id", "text")
    def run(mapCap: Long = 200000, bnlCap: Long = 20000,
            vocabCap: Long = 1024): Set[Long] =
      Dedup.diversityFilterTfidf(d, "text", "doc_id",
          mapVerifyDocCap = mapCap, bnlDocCap = bnlCap,
          denseVocabCap = vocabCap)
        .as[Long].collect().toSet
    val bnl = run() // default caps: broadcast nested-loop semi regime
    assert(bnl == run(bnlCap = 0)) // dense candidate-join regime
    assert(bnl == run(bnlCap = 0, vocabCap = 0)) // sparse-map regime
    assert(bnl == run(mapCap = 0)) // per-term postings-join regime
    assert(bnl == Set(1L, 2L, 4L, 5L)) // exact dups 3/6 drop
  }

  test("diversityFilterTfidf is partition-order stable (the round-12 " +
    "Spread precondition: value-ordered norm fold + tidx-sorted maps)") {
    // enough docs with shared vocabulary that partial-agg merge order
    // actually varies across partitionings; near-dup pairs sit at the
    // threshold boundary's neighborhood
    val r = new scala.util.Random(3)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rows = (1L to 120L).map { i =>
      val base = r.shuffle(words).take(6)
      (i, (base :+ (if (i % 3 == 0) "common" else s"tail${i % 7}"))
        .mkString(" "))
    }
    val d = rows.toDF("doc_id", "text")
    def run(parts: Int, mapCap: Long = 200000, bnlCap: Long = 20000,
            vocabCap: Long = 1024): Set[Long] =
      graft.ops.Dedup.diversityFilterTfidf(d.repartition(parts),
          "text", "doc_id", mapVerifyDocCap = mapCap, bnlDocCap = bnlCap,
          denseVocabCap = vocabCap)
        .as[Long].collect().toSet
    val one = run(1)
    assert(one == run(7), "BNLJ regime drifted with partitioning")
    assert(one == run(32), "BNLJ regime drifted with partitioning")
    // the sparse-map regime folds map entries per pair — the tidx sort
    // must make it partitioning-independent too
    val sparse1 = run(1, bnlCap = 0, vocabCap = 0)
    assert(sparse1 == run(13, bnlCap = 0, vocabCap = 0),
      "sparse-map regime drifted with partitioning")
  }

  test("dropProperPrefixes matches brute force, incl. chains and boundaries") {
    // chain a < ab < abc (a, ab dominated), equal-after-distinct values,
    // a value that is a prefix of nothing ("b"), a null, and enough rows
    // that the range partitioner actually splits (partition-boundary lasts
    // exercise the boundary window, not just the in-partition lead)
    val vals = Seq("a", "ab", "abc", "b", "ba", "cat", "cat", "catalog",
      "dog", "do", "zz", null) ++ (0 until 200).map(i => f"pad$i%03d")
    val df = vals.toDF("v")
    val kept = Dedup.dropProperPrefixes(df, "v")
      .collect().map(_.getString(0)).toSet
    val distinct = vals.filter(_ != null).distinct
    val expect = distinct.filterNot(v =>
      distinct.exists(w => w != v && w.startsWith(v))).toSet + null
    assert(kept.map(Option(_).orNull) == expect.map(Option(_).orNull))
    assert(!kept.contains("a") && !kept.contains("ab") && kept.contains("abc"))
    assert(!kept.contains("do") && kept.contains("dog"))
    assert(!kept.contains("b") && kept.contains("ba")) // ba dominates b
  }

  test("suffixSpanDedup: overlapping duplicated windows merge into ONE " +
    "maximal span; within-doc-only repeats don't mark; gaps > L split") {
    // docs A and B share a 7-token run ("one two three four five six
    // seven") with L=4 → window starts 0..3 in A merge to one 7-token
    // span; doc C repeats a 4-gram INTERNALLY only → no cross-doc dup;
    // doc D shares a second, disjoint 4-gram with A far from A's first
    // span → two separate spans in A
    val docs = Seq(
      (1L, "one two three four five six seven xx yy zz qq ww ee rr " +
        "alpha beta gamma delta"),
      (2L, "pre one two three four five six seven post"),
      (3L, "rep rep rep rep mid rep rep rep rep"),
      (4L, "tail alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.suffixSpanDedup(docs, "text", "doc_id", minTokens = 4)
      .orderBy("id", "start_pos")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 7, "one two three four five six seven"),
      (1L, 14, 4, "alpha beta gamma delta"),
      (2L, 1, 7, "one two three four five six seven"),
      (4L, 1, 4, "alpha beta gamma delta")), out.toString)
    // doc 3's internal repeat never surfaces (cross-doc contract)
    assert(!out.exists(_._1 == 3L))
    // coverage-contiguity edge: starts exactly L apart still merge
    // (coverage [p, p+L-1] and [p+L, p+2L-1] touch with no gap)
    val edge = Seq(
      (1L, "a b c d e f g h"),   // windows at 0 and 4, L=4: starts 4 apart
      (2L, "a b c d zz"), (3L, "e f g h zz")).toDF("doc_id", "text")
    val merged = Dedup.suffixSpanDedup(edge, "text", "doc_id", minTokens = 4)
      .filter(col("id") === 1L)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(merged == Seq((1L, 0, 8, "a b c d e f g h")), merged.toString)
  }

  test("ngram jaccard: identical=1.0, near-dup in (0,1)") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccard(docs, pairs, "text", "doc_id", 3)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(out(0)._3 == 1.0)
    assert(out(1)._3 > 0.3 && out(1)._3 < 1.0)
  }

  test("simhash pairs: normalized duplicate at hamming 0") {
    val out = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.9f, 0.1f, 0.0f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2),
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 2))
    .toDF("vec_id", "embedding", "label")

  test("brute-force topK ranks by cosine") {
    val out = Similarity.topK(vecs.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", Seq(1.0, 0.0, 0.0, 0.0), 2)
      .select("id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L) || out.head == 1L)
  }

  test("diverseTopK round-robins across groups") {
    val out = Similarity.diverseTopK(vecs, "embedding", "vec_id", "label",
      Seq(1.0, 0.0, 0.0, 0.0), 3, 2)
      .select("grp").as[Int].collect()
    assert(out.toSet.size == 3) // one per label before any second pick
  }

  test("IVF with full probe equals brute force; partial probe is a subset") {
    val assigned = Similarity.ivfAssign(vecs, "embedding", 4, 4)
    val full = Similarity.ivfTopK(assigned, "embedding", "vec_id",
      Seq(1.0, 0.0, 0.0, 0.0), 3, 4, 4).select("id").as[Long].collect()
    val brute = Similarity.topK(vecs, "embedding", "vec_id",
      Seq(1.0, 0.0, 0.0, 0.0), 3).select("id").as[Long].collect()
    assert(full.toSeq == brute.toSeq)
    val partial = Similarity.ivfTopK(assigned, "embedding", "vec_id",
      Seq(1.0, 0.0, 0.0, 0.0), 3, 4, 2).select("id").as[Long].collect()
    assert(partial.toSet.subsetOf(vecs.select("vec_id").as[Long].collect().toSet))
  }

  test("crossCorpusNearDup flags corpus docs colliding with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text about spark dataframes and joins here"),
      (3L, "THE QUICK BROWN FOX jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("bench_id", "text")
    val hits = Dedup.crossCorpusNearDup(corpus, "text", "doc_id",
      bench, "text", "bench_id")
      .as[(Long, Long, Double)].collect()
    // doc 1 exact and doc 3 case-variant both collide at jaccard 1.0
    assert(hits.map(h => (h._1, h._2)).toSet == Set((1L, 100L), (3L, 100L)))
    assert(hits.forall(_._3 == 1.0))
  }

  test("ngramFrequencies counts every occurrence, ranks deterministically") {
    import graft.ops.TextAnalysis
    val docs = Seq("a b a b c", "a b x", "z").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val uni = TextAnalysis.ngramFrequencies(docs, "text", n = 1, k = 10)
      .select("gram", "freq").as[(String, Long)].collect().toMap
    assert(uni("a") == 3 && uni("b") == 3 && uni("c") == 1 && uni("z") == 1)
    val bi = TextAnalysis.ngramFrequencies(docs, "text", n = 2, k = 10)
      .select("gram", "freq", "rank").as[(String, Long, Int)].collect()
    assert(bi.head == (("a b", 3L, 1))) // occurrences, not distinct-per-doc
    assert(bi.map(_._1).toSet.contains("b a"))
    // single-token doc contributes no bigrams; short docs don't blow up
    assert(!bi.map(_._1).exists(_.contains("z")))
  }

  test("hash sampling is deterministic, monotone in rate, and stratified") {
    import graft.ops.Sampling
    val df = spark.range(1000).toDF("id")
      .withColumn("grp", (col("id") % 2 === 0).cast("string"))
    val s10 = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    val s10b = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    val s20 = Sampling.hashSample(df, "id", 0.2).select("id").as[Long].collect().toSet
    assert(s10 == s10b)                  // deterministic
    assert(s10.subsetOf(s20))            // monotone in rate
    assert(s10.size > 50 && s10.size < 150) // roughly the rate
    // different salt -> a different (independent) sample
    val salted = Sampling.hashSample(df, "id", 0.1, salt = "x")
      .select("id").as[Long].collect().toSet
    assert(salted != s10)
    // stratified: listed stratum at high rate, default near zero
    val strat = Sampling.stratified(df, "id", "grp",
      rates = Map("true" -> 0.5), defaultRate = 0.0)
    assert(strat.filter(col("grp") === "false").count() == 0)
    val kept = strat.count()
    assert(kept > 150 && kept < 350)
    intercept[IllegalArgumentException](
      Sampling.hashSample(df, "id", 1.5))
  }

  test("connectedComponents: min reachable id, chains and singleton pairs") {
    // two clusters: a chain 1-2-3-4 (transitive closure through the chain)
    // and a lone pair 10-11; node 4 only reaches 1 via two hops
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // a long path converges too (diameter > 2 needs several rounds)
    val path = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val pc = Dedup.connectedComponents(path).as[(Long, Long)].collect().toMap
    assert(pc.values.toSet == Set(1L) && pc.size == 9)
  }

  test("connectedComponents: O(log n) rounds on an adversarial chain") {
    // a 128-node path has diameter 127: min-label propagation would need
    // ~127 rounds; large-star/small-star must stay logarithmic
    val path = (1L to 128L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    // localEdgeCap = 0 forces the pure distributed loop — the default cap
    // would absorb this cap-sized fixture into the driver-local finisher
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(path, localEdgeCap = 0L)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == 128 && m.values.toSet == Set(1L))
    assert(rounds <= 10, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("connectedComponents: local finisher handoff matches the distributed loop") {
    // a shape with a long chain + side branches, on STRING ids (exercises
    // the UTF-8-byte driver ordering): all three execution modes — pure
    // local (cap ≥ edges), hybrid (a few distributed rounds, then local
    // finish on the contracted core), pure distributed (cap 0) — must
    // produce identical labels
    val pairs = ((1 to 40).map(i => (f"n$i%03d", f"n${i + 1}%03d")) ++
      Seq(("n005", "zzz"), ("aaa", "n020"), ("x1", "x2"))).toDF("id_a", "id_b")
    def run(cap: Long) = Dedup.connectedComponents(pairs, localEdgeCap = cap)
      .as[(String, String)].collect().toMap
    val distributed = run(0L)
    assert(run(Long.MaxValue) == distributed)
    assert(run(8L) == distributed)
    assert(distributed("n041") == "aaa" && distributed("x2") == "x1")
  }

  test("embeddingNearDup with sign-plane buckets keeps true near-dups") {
    val exact = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.9, planes = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 1L)) && exact.contains((2L, 3L)))
    val bucketed = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.9, planes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact))
  }

  test("quadratic exact modes refuse unbounded inputs (enforced contracts)") {
    // embeddingNearDup planes=0 trips its row cap before any cross join
    val e = intercept[IllegalArgumentException](
      Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.9,
        planes = 0, exactModeCap = 2L))
    assert(e.getMessage.contains("quadratic"))
    // knnJoin trips its right-side cap
    val k = intercept[IllegalArgumentException](
      graft.ops.Similarity.knnJoin(vecs, vecs, "embedding", "vec_id",
        k = 2, maxRightRows = 2L))
    assert(k.getMessage.contains("quadratic"))
    // and both still work under the cap (the guard is a gate, not a break)
    assert(Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.9,
      planes = 0).count() >= 2)
    assert(graft.ops.Similarity.knnJoin(vecs, vecs, "embedding", "vec_id",
      k = 2).count() > 0)
  }

  test("embeddingNearDup LSH: empty input keeps the caller's id type") {
    // string-id caller on an empty frame must get string id_a/id_b back
    // (a hardcoded LONG would break downstream unions with non-empty runs)
    val empty = Seq.empty[(String, Array[Double])].toDF("doc", "embedding")
    val out = Dedup.embeddingNearDup(empty, "embedding", "doc", 0.9, planes = 2)
    assert(out.count() == 0)
    assert(out.schema("id_a").dataType.typeName == "string")
    assert(out.schema("id_b").dataType.typeName == "string")
  }

  test("embeddingNearDup LSH enforces the fixed-dimension contract") {
    // ragged embeddings would silently fold only the first `dim` elements
    // of longer rows — refuse loudly instead. The guard rides the bucketing
    // scan (raise_error in the projection, not a separate precheck
    // aggregate), so it fires on execution, wrapped by the task failure.
    val ragged = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0, 0.5)))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(ragged, "embedding", "vec_id", 0.9,
      planes = 2)
    val e = intercept[Exception](out.count())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("fixed-dimension"))
  }

  test("semanticDedup drops higher-id in-cell near-dups, keeps cross-cell " +
    "twins and sub-threshold neighbors") {
    // cells are pre-assigned: ids 1/2/3 share cell 0 (1≈2 near-identical,
    // 3 orthogonal); id 4 duplicates 1 exactly but sits in cell 1, so the
    // cluster boundary must protect it (the documented approximation).
    val assigned = Seq(
      (1L, Array(1.0, 0.0, 0.0), 0),
      (2L, Array(0.999, 0.01, 0.0), 0),
      (3L, Array(0.0, 1.0, 0.0), 0),
      (4L, Array(1.0, 0.0, 0.0), 1))
      .toDF("id", "emb", "ivf_cell")
    val kept = Dedup.semanticDedup(assigned, threshold = 0.95)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("ngramContamination counts distinct shared grams, exact and " +
    "normalization-aware") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "THE QUICK  BROWN fox!! something else entirely here"), // norm overlap
      (3L, "totally unrelated content with no overlap at all"))
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1("the quick brown fox runs")).toDF("text")
    val out = Dedup.ngramContamination(corpus, "text", "doc_id", bench,
      "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // bench 4-grams: {the quick brown fox, quick brown fox runs}
    assert(out == Map(1L -> 1L, 2L -> 1L)) // doc 3 absent = clean
  }

  test("semanticDedup at threshold 1.0+ keeps everything") {
    val assigned = Seq(
      (1L, Array(1.0, 0.0), 0), (2L, Array(1.0, 0.0), 0))
      .toDF("id", "emb", "ivf_cell")
    // cosine of identical vectors is 1.0 — strict >= keeps only exact
    // duplicates out; a threshold above 1.0 disables the dedup entirely
    assert(Dedup.semanticDedup(assigned, 1.5).count() == 2)
    assert(Dedup.semanticDedup(assigned, 1.0).select("id").as[Long]
      .collect().toSeq == Seq(1L))
  }

  test("weightedSample: matches independent A-Res arithmetic, " +
    "partition-independent, excludes non-positive weights") {
    val rows = (1L to 40L).map(i => (i, (i % 7).toInt)) // weights 0..6
    val df = rows.toDF("id", "w")
    // independent replay: u from the md5 h60 slice, priority ln(u)/w
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val want = rows.filter(_._2 > 0).map { case (id, w) =>
      val u = h60(s"s1#$id").toDouble / 1.152921504606847e18
      (id, math.log(u) / w)
    }.sortBy { case (id, p) => (-p, id) }.take(5).map(_._1).toSet
    val got = Sampling.weightedSample(df, "id", "w", k = 5, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    val got7 = Sampling.weightedSample(df.repartition(7), "id", "w", 5, "s1")
      .select("id").as[Long].collect().toSet
    assert(got7 == got)
    // zero-weight rows can never be drawn even with k > candidates
    val all = Sampling.weightedSample(df, "id", "w", k = 40, salt = "s1")
      .select("id").as[Long].collect()
    assert(all.length == rows.count(_._2 > 0))
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "id", "w", k = 0)
    }
  }

  test("JL sign projection preserves pairwise cosine within the " +
    "distortion bound and is layout-independent") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val proj = graft.ops.Similarity.randomProject(emb, "embedding",
      "vec_id", dim = 64, outDim = 16, seed = "jl1")
      .filter(org.apache.spark.sql.functions.col("id") < 40)
    val pv = proj.as[(Long, Seq[Double])].collect().toMap
    val ev = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 40)
      .as[(Long, Seq[Float], Int)].collect()
      .map(r => r._1 -> r._2.map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val errs = for (i <- pv.keys.toSeq.sorted; j <- pv.keys.toSeq.sorted
                    if i < j)
      yield math.abs(cos(pv(i), pv(j)) - cos(ev(i), ev(j)))
    // 16-dim sign projection: cosine estimator std ≈ 1/√16 = 0.25, so the
    // worst of ~780 pairs can reach ~3σ; the MEAN is the real gate — a
    // broken sign matrix or fold pushes it toward 0.5+
    assert(errs.max < 0.9, s"max distortion ${errs.max}")
    assert(errs.sum / errs.size < 0.2, s"mean distortion ${errs.sum / errs.size}")
    val again = graft.ops.Similarity.randomProject(emb.repartition(7),
      "embedding", "vec_id", dim = 64, outDim = 16, seed = "jl1")
      .filter(org.apache.spark.sql.functions.col("id") < 40)
      .as[(Long, Seq[Double])].collect().toMap
    assert(again == pv)
  }

  test("duplicateSpanRemoval deletes every occurrence after the corpus " +
    "first, at any offset, within and across documents") {
    import org.apache.spark.sql.functions.col
    val boiler = "one two three four" // the 4-token duplicated span
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),      // first occurrence
      (2L, s"prefix words here $boiler epsilon"),   // mid-doc occurrence
      (3L, s"$boiler $boiler zeta"),                // intra-doc repeat
      (4L, "totally unrelated text stays put"),
      (5L, "shorty")).toDF("doc_id", "text")        // shorter than span
    val out = graft.ops.Dedup
      .duplicateSpanRemoval(docs, "text", "doc_id", spanTokens = 4)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
          r.getAs[String]("text_clean"))).toMap
    // doc 1 holds the first (1, pos 0) occurrence — untouched
    assert(out(1L) == ((8, 0, s"$boiler alpha beta gamma delta")))
    // doc 2's mid-doc occurrence removed, surroundings intact
    assert(out(2L) == ((8, 4, "prefix words here epsilon")))
    // doc 3: both copies are non-first; the crossing spans ("three four
    // one two" etc.) are also duplicated INSIDE doc 3 relative to their
    // own first in-doc position — by the rule, the union of non-first
    // occurrences covers both boiler copies
    assert(out(3L)._2 == 8 && out(3L)._3 == "zeta")
    assert(out(4L) == ((5, 0, "totally unrelated text stays put")))
    assert(out(5L) == ((1, 0, "shorty")))
  }

  test("winnowingFingerprints: guarantee (shared >= k+w-1-token substring " +
    "=> common fingerprint), density, short-doc degenerate window") {
    import org.apache.spark.sql.functions.col
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"zeta eta theta iota $shared kappa"),
      (3L, "completely different words live here now today friends"),
      (4L, "tiny doc"),          // < k tokens: no grams at all
      (5L, "just three words"))  // exactly one gram, one truncated window
      .toDF("doc_id", "text")
    val fps = graft.ops.Dedup
      .winnowingFingerprints(docs, "text", "doc_id", k = 3, w = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("pos"),
        r.getAs[Long]("fp")))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // guarantee: docs 1 and 2 share a 10-token run >= k+w-1 = 6 tokens
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // doc 3 shares nothing with 1 or 2
    assert((byDoc(3L) & (byDoc(1L) | byDoc(2L))).isEmpty)
    // density: at least one fingerprint per w consecutive windows, and
    // far fewer fingerprints than grams
    val d1Pos = fps.filter(_._1 == 1L).map(_._2).sorted
    assert(d1Pos.sliding(2).forall(p => p.length < 2 || p(1) - p(0) <= 4))
    // no-gram doc emits nothing; one-gram doc emits its single hash
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).size == 1)
    // determinism under repartition
    val again = graft.ops.Dedup.winnowingFingerprints(
        docs.repartition(7), "text", "doc_id", k = 3, w = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("pos"),
        r.getAs[Long]("fp"))).toSet
    assert(again == fps.toSet)
  }

  test("winnowOverlapPairs: contaminated docs pair on shared fingerprints; " +
    "over-df boilerplate hashes are pruned before the self-join") {
    import org.apache.spark.sql.functions.col
    val boiler = "all rights reserved contact us for more information today ok"
    val docs = (1L to 8L).map { i =>
      val body = s"unique body $i with words w${i}a w${i}b w${i}c w${i}d"
      // docs 1,2: shared 11-token tail; ALL docs share `boiler`
      if (i <= 2) (i, s"$body $boiler shared tail one two three four five six seven eight")
      else (i, s"$body $boiler")
    }.toDF("doc_id", "text")
    val fps = graft.ops.Dedup
      .winnowingFingerprints(docs, "text", "doc_id", k = 3, w = 4)
    // maxDf = 4 < 8 docs: the ubiquitous boiler fingerprints are pruned,
    // so ONLY the 1-2 pair (private shared tail) survives
    val pairs = graft.ops.Dedup.winnowOverlapPairs(fps, minShared = 1,
        maxDf = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => (a, b) == ((1L, 2L)) },
      s"boilerplate pair leaked: ${pairs.mkString(",")}")
    // with the cap lifted, the boiler hashes pair everyone: 8*7/2 pairs
    val all = graft.ops.Dedup.winnowOverlapPairs(fps, minShared = 1,
      maxDf = 100).count()
    assert(all == 28L)
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.winnowOverlapPairs(fps, minShared = 0) }
  }
}
