package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H}

/** Dev harness: stage-by-stage timing of a query, to localize bench cost.
  * Usage: runMain graft.tools.Profile <sfDir> <what>. */
object Profile {
  def time(name: String)(f: => Long): Unit = { timeRet(name)(f); () }

  /** Like [[time]] but returns the elapsed seconds for ratio probes. */
  def timeRet(name: String)(f: => Long): Double = {
    val t0 = System.nanoTime()
    val n = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[profile] $name%-28s $sec%8.3f s  rows=$n")
    sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "minhash"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror Bench's partition sizing — profiles must see the same plans
      // the bench times (128 MB splits would serialize the scan-side work)
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 18).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    what match {
      case "minhash" =>
        time("normalize+tokenize") {
          docs.select(split(graft.functions.TextFunctions.searchStr(col("text")), "\\s+").as("t"))
            .select(sum(size(col("t")))).collect(); docs.count()
        }
        time("shingles") {
          docs.select(H.shingles(col("text"), 3).as("sh"))
            .select(sum(size(col("sh")))).collect(); docs.count()
        }
        time("bases (md5/shingle)") {
          docs.select(transform(H.shingles(col("text"), 3), s => H.h60(s)).as("b"))
            .select(sum(size(col("b")))).collect(); docs.count()
        }
        time("full signature (composed)") {
          docs.select(H.minhashSignature(col("text"), 16, 3).as("sig"))
            .select(sum(element_at(col("sig"), 1))).collect(); docs.count()
        }
        time("full signature (native)") {
          graft.functions.MinhashSignature.register(spark)
          docs.select(graft.functions.MinhashSignature
            .signature(col("text"), 16, 3).as("sig"))
            .select(sum(element_at(col("sig"), 1))).collect(); docs.count()
        }
        time("minhashLsh end-to-end") {
          graft.ops.Dedup.minhashLsh(docs, "text", "doc_id").count()
        }
      case "ngram" =>
        time("ngramFrequencies (compiled)") {
          graft.ops.TextAnalysis.ngramFrequencies(docs, "text", 2, 200).count()
        }
        time("repetitionProfile (compiled)") {
          graft.ops.TextAnalysis.repetitionProfile(docs, "text", "doc_id", 2).count()
        }
        time("hashClassifierScore") {
          graft.ops.TextAnalysis.hashClassifierScore(docs, "text").count()
        }
        time("packSequences") {
          graft.ops.Packing.packSequences(docs, "doc_id", "text", 2048).count()
        }

      case "curation" =>
        import graft.ops.{Dedup, TextAnalysis}
        var filtered: DataFrame = null
        time("qualityFilter") {
          filtered = TextAnalysis.qualityFilter(docs, "text",
            minScore = 0.3, minTokens = 10, maxTokens = 10000)
            .localCheckpoint(true)
          filtered.count()
        }
        var canon: DataFrame = null
        time("exact dedup") {
          canon = Dedup.exact(filtered, "text", "doc_id").localCheckpoint(true)
          canon.count()
        }
        var pairs: DataFrame = null
        time("minhashLsh pairs") {
          pairs = Dedup.minhashLsh(canon, "text", "doc_id",
            numHashes = 16, bands = 8, shingleSize = 3).localCheckpoint(true)
          pairs.count()
        }
        time("connectedComponents") {
          Dedup.connectedComponents(pairs).count()
        }

      case "shufflebytes" =>
        // host-independent evidence for the heap-vs-window top-k: total
        // shuffle bytes written per job, window rank vs TopKAgg on the
        // same per-key truncation
        val written = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
              written.addAndGet(
                s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_extendedprice"))
        li.count()
        def run(name: String)(f: => Long): Unit = {
          Thread.sleep(1500)
          written.set(0)
          val n = f
          Thread.sleep(2500)
          println(f"[profile] $name%-28s shuffleMB=${written.get / 1e6}%8.2f rows=$n")
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey")
          .orderBy(desc("l_extendedprice"), col("l_linenumber"), col("l_partkey"))
        run("window rank top-2/key") {
          li.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2).count()
        }
        run("TopKAgg top-2/key") {
          graft.functions.TopKAgg.topKPerKey(li, Seq("l_orderkey"),
            Seq(negate(col("l_extendedprice")), col("l_linenumber"),
              col("l_partkey")), 2).count()
        }
        run("window dedup-winner/key") {
          val wd = org.apache.spark.sql.expressions.Window
            .partitionBy("l_orderkey").orderBy(col("l_linenumber"), col("l_partkey"))
          li.withColumn("rk", row_number().over(wd)).filter(col("rk") === 1).count()
        }
        run("min_by dedup-winner/key") {
          li.groupBy("l_orderkey")
            .agg(min_by(struct(li.columns.map(col): _*),
              struct(col("l_linenumber"), col("l_partkey"))).as("_r"))
            .select(col("_r.*")).count()
        }
        // many-rows-per-key regime (the fuzzyLink/knnJoin shape: thousands
        // of candidates per key, k kept) — where the heap pre-reduction
        // actually pays
        val wf = org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag", "l_linestatus")
          .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        val lif = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
        run("window top-5/flag (100k rows/key)") {
          lif.withColumn("rk", row_number().over(wf)).filter(col("rk") <= 5).count()
        }
        run("TopKAgg top-5/flag (100k rows/key)") {
          graft.functions.TopKAgg.topKPerKey(lif,
            Seq("l_returnflag", "l_linestatus"),
            Seq(negate(col("l_extendedprice")), col("l_orderkey"),
              col("l_linenumber"), col("l_partkey")), 5).count()
        }

      case "heavyhitters" =>
        // host-independent evidence for the sketch-then-verify pattern:
        // on a HIGH-vocabulary stream (the 100 TB regime: most tokens are
        // singletons) the brute groupBy must move every distinct key
        // through the shuffle, while the Misra-Gries pass moves only
        // O(capacity) entries per map task and the recount only the
        // candidate-filtered rows
        val written = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
              written.addAndGet(
                s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          })
        val n = 4000000L
        // 1% heavy tokens (7 of them), 99% unique singletons
        val tok = spark.range(0, n, 1, 32).select(
          when(col("id") % 100 < 1,
            concat(lit("h"), (col("id") % 7).cast("string")))
            .otherwise(concat(lit("t"), col("id"))).as("token"))
        tok.count()
        val thr = n / 1000
        def run(name: String)(f: => Long): Unit = {
          Thread.sleep(1500); written.set(0)
          val t0 = System.nanoTime(); val r = f
          println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
            f"  shuffleMB=${written.get / 1e6}%8.2f rows=$r")
        }
        run("brute groupBy all tokens") {
          tok.groupBy("token").agg(count(lit(1)).as("c"))
            .filter(col("c") >= thr).count()
        }
        run("MG sketch + exact recount") {
          val row = tok.select(array(col("token")).as("toks"))
            .agg(org.apache.spark.sql.GraftSqlBridge
              .misraGries(col("toks"), 2048).as("s")).head()
          val cands = row.getSeq[org.apache.spark.sql.Row](0)
            .map(_.getString(0))
          tok.filter(col("token").isin(cands: _*))
            .groupBy("token").agg(count(lit(1)).as("c"))
            .filter(col("c") >= thr).count()
        }

      case "scaleprobe" =>
        // would-it-scale probe: documents replicated xN with perturbed ids
        // and text; per-row cost of the dedup path should stay ~flat
        val n = if (args.length > 2) args(2).toInt else 16
        import graft.ops.Dedup
        val reps = spark.range(0, n).select(col("id").cast("int").as("rep"))
        val big = docs.crossJoin(reps)
          .select(concat(col("doc_id"), lit("#"), col("rep")).as("doc_id"),
            concat(col("text"), lit(" rep"), col("rep")).as("text"))
          .repartition(32)
          .localCheckpoint(true)
        val rows = big.count()
        println(s"[profile] scaleprobe rows=$rows (${n}x)")
        time(s"exact dedup ${n}x") {
          Dedup.exact(big, "text", "doc_id").count()
        }
        time(s"minhashLsh pairs ${n}x") {
          Dedup.minhashLsh(big, "text", "doc_id",
            numHashes = 16, bands = 8, shingleSize = 3).count()
        }
        time(s"text profile ${n}x") {
          graft.ops.TextAnalysis.profile(big, "text").count()
        }
        time("exact dedup 1x") {
          Dedup.exact(docs, "text", "doc_id").count()
        }
        time("minhashLsh pairs 1x") {
          Dedup.minhashLsh(docs, "text", "doc_id",
            numHashes = 16, bands = 8, shingleSize = 3).count()
        }
        time("text profile 1x") {
          graft.ops.TextAnalysis.profile(docs, "text").count()
        }

      case "prefixscale" =>
        // would-it-scale probe for the sorted-successor prefix dedup: part
        // names replicated xN under disjoint "r<rep>-" namespaces (prefix
        // chains stay within a namespace). Linear plan => per-row cost ~flat
        // from 1x to 8x; the round-7 first-char-bucket self-join grew the
        // per-row cost ~linearly with N (quadratic total).
        val np = if (args.length > 2) args(2).toInt else 8
        val names1 = spark.read.parquet(s"$sfDir/part.parquet")
          .select(col("p_name").as("v"))
        val repsP = spark.range(0, np).select(col("id").as("rep"))
        val bigNames = names1.crossJoin(repsP)
          .select(concat(lit("r"), col("rep"), lit("-"), col("v")).as("v"))
          .repartition(32).localCheckpoint(true)
        val n1 = names1.count(); val nN = bigNames.count()
        println(s"[profile] prefixscale rows 1x=$n1 ${np}x=$nN")
        def prefixDedup(d: DataFrame) =
          graft.ops.Dedup.dropProperPrefixes(d, "v").count()
        prefixDedup(names1) // warm codegen
        val t1 = timeRet(s"prefix dedup 1x") { prefixDedup(names1) }
        val tN = timeRet(s"prefix dedup ${np}x") { prefixDedup(bigNames) }
        println(f"[profile] per-row us: 1x=${t1 * 1e6 / n1}%.2f " +
          f"${np}x=${tN * 1e6 / nN}%.2f ratio=${tN * n1 / (t1 * nN)}%.2f")

      case "annrecall" =>
        // recall@k probe for the approximate ANN paths — the number a
        // user needs to size nprobe/m/codes at scale (the trade the
        // reference's OpenSearch knn backend publishes). Ground truth per
        // metric family: exact cosine top-k for IVF (ivfTopK scores
        // cosine inside probed cells), exact L2 top-k for PQ / IVF-PQ
        // (ADC approximates squared L2). Results table: ANN_RECALL.md.
        import graft.ops.{MlAnn, Similarity}
        import graft.functions.{VectorFunctions => VF}
        val k = 10
        def ids(df: DataFrame): Seq[Long] =
          df.select("id").collect().map(_.getLong(0)).toSeq
        // one full sweep (IVF nprobe ladder + PQ/IVF-PQ m×codes ladder)
        // over a given corpus; run TWICE — the hash-derived testdata
        // vectors (near-isotropic: PQ's worst case) and a planted-cluster
        // corpus of the same size (the structure real sentence embeddings
        // have, where PQ codebooks capture far more variance per byte)
        def sweep(tag: String, emb0: DataFrame, nlist: Int): Unit = {
          val emb = emb0.select(col("vec_id"), col("embedding")).cache()
          val nVecs = emb.count()
          val qs = emb.filter(col("vec_id") <= 20)
            .collect()
            .map(r => (r.getLong(0),
              r.getSeq[Float](1).map(_.toDouble).toSeq))
            .sortBy(_._1)
          println(s"[profile] annrecall[$tag] vectors=$nVecs " +
            s"queries=${qs.length} k=$k")
          // exact ground truths (brute force over every vector)
          val gtCos: Map[Long, Set[Long]] = qs.map { case (qid, q) =>
            qid -> ids(Similarity.topK(emb, "embedding", "vec_id", q, k))
              .toSet
          }.toMap
          def l2Top(q: Seq[Double]): Set[Long] = ids(
            emb.select(col("vec_id").as("id"),
              aggregate(zip_with(VF.toDouble(col("embedding")), typedlit(q),
                (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
                .as("d"))
              .orderBy(col("d"), col("id")).limit(k)).toSet
          val gtL2: Map[Long, Set[Long]] = qs.map { case (qid, q) =>
            qid -> l2Top(q) }.toMap
          def recall(name: String, gt: Map[Long, Set[Long]])
                    (approx: Seq[Double] => DataFrame): Unit = {
            val t0 = System.nanoTime()
            val r = qs.map { case (qid, q) =>
              (ids(approx(q)).toSet & gt(qid)).size.toDouble / k }
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[profile] annrecall[$tag] $name%-26s recall@$k=" +
              f"${r.sum / r.size}%.3f  t=${sec / qs.length}%.3f s/query")
          }
          // IVF nprobe ladder (nlist = 8 on the testdata corpus — the
          // bench gate config; 32 on the planted-cluster corpus, sized to
          // its cluster count: residual encoding only pays off when the
          // coarse cells capture the cluster structure)
          val (assigned, centers) = MlAnn.detKmeansIvf(
            emb, "embedding", "vec_id", nlist = nlist, iters = 2)
          assigned.cache().count()
          Seq(1, 2, 4, nlist).distinct.filter(_ <= nlist).foreach { np =>
            recall(s"ivf nlist=$nlist nprobe=$np", gtCos)(q =>
              MlAnn.ivfTopK(assigned, centers, q, k, np))
          }
          // PQ at the bench config (m=2, codes=4: 2 bytes/vector —
          // coarse) and finer configs
          Seq((2, 4), (8, 16), (16, 32)).foreach { case (m, codes) =>
            val cbs = MlAnn.pqTrain(emb, "embedding", "vec_id",
              dim = 64, m = m, codes = codes, iters = 1)
            val enc = MlAnn.pqEncode(emb, "embedding", "vec_id", cbs)
              .cache()
            enc.count()
            recall(s"pq m=$m codes=$codes", gtL2)(q =>
              MlAnn.pqTopK(enc, cbs, q, k))
            Seq(1, nlist).distinct.foreach { np =>
              recall(s"ivfpq m=$m codes=$codes nprobe=$np", gtL2)(q =>
                MlAnn.ivfPqTopK(assigned, centers, enc, cbs, q, k, np))
            }
            enc.unpersist()
            // RESIDUAL IVF-PQ at the same budget — the FAISS discipline:
            // codebooks train on (vector − coarse centroid), so the
            // m×codes budget quantizes within-cell displacements instead
            // of re-separating cluster centers
            val cbsR = MlAnn.pqTrainResidual(assigned, centers,
              dim = 64, m = m, codes = codes, iters = 1)
            val encR = MlAnn.pqEncodeResidual(assigned, centers, cbsR)
              .cache()
            encR.count()
            Seq(1, nlist).distinct.foreach { np =>
              recall(s"ivfpq-res m=$m codes=$codes nprobe=$np", gtL2)(q =>
                MlAnn.ivfPqResidualTopK(encR, centers, cbsR, q, k, np))
            }
            // refine ladder: ADC top-R -> exact rerank (full probe, so
            // the R knob is the only variable)
            Seq(4 * k, 8 * k).foreach { r =>
              recall(s"ivfpq-res-refine m=$m codes=$codes R=$r", gtL2)(q =>
                MlAnn.ivfPqRefineTopK(encR, assigned, centers, cbsR, q,
                  k, nlist, r))
            }
            encR.unpersist()
          }
          assigned.unpersist(); emb.unpersist()
        }
        val iso = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter(col("vec_id") =!= 0)
        sweep("isotropic", iso, nlist = 8)
        sweep("clustered", MlAnn.plantedClusterCorpus(
          spark, n = iso.count().toInt, dim = 64, clusters = 32),
          nlist = 32)

      case "cypherscale" =>
        // would-it-scale probe for the staged cypher compiler: the
        // statement graph (edges + props + the $statementIds literal)
        // replicated xN under disjoint per-replica id namespaces
        // ("_r<k>" suffix on every node id — a suffix keeps the
        // label-prefix convention intact), the flagship
        // statements_cypher run VERBATIM on each size. The compiled
        // plan is 3 equi-join hops + 2 grouped aggregations (the
        // m-aggregation-stages = m-shuffles contract, PLAN_CENSUS
        // q_cypher_statements: 2 shuffles), so per-replica cost should
        // stay ~flat 1x -> Nx: every operator is a hash join / hash
        // aggregate keyed on namespaced ids, nothing quadratic,
        // nothing driver-side.
        val reps = if (args.length > 2) args(2).toInt else 8
        val (ef0, np0) = graft.queries.Tables.stmtGraph(spark, sfDir)
        val ids0 = graft.queries.Tables.stmtStatementIds(spark, sfDir)
        def replicate(n: Int): (DataFrame, DataFrame, Seq[String]) = {
          val efs = (0 until n).map { kk =>
            ef0.select(concat(col("src"), lit(s"_r$kk")).as("src"),
              concat(col("dst"), lit(s"_r$kk")).as("dst"), col("label"))
          }.reduce(_ union _)
          val nps = (0 until n).map { kk =>
            np0.withColumn("id", concat(col("id"), lit(s"_r$kk")))
          }.reduce(_ union _)
          val idsN = (0 until n).flatMap(kk => ids0.map(_ + s"_r$kk"))
          (efs.cache(), nps.cache(), idsN)
        }
        def runOnce(ef: DataFrame, np: DataFrame,
                    sids: Seq[String]): (Long, Double) = {
          val t0 = System.nanoTime()
          val rows = graft.byokg.CypherLite.run(ef, Some(np),
              graft.queries.GraphQueries.statementsCypherText,
              Map("statementIds" -> sids, "limit" -> 1000000))
            .fold(err => sys.error(err), identity).count()
          (rows, (System.nanoTime() - t0) / 1e9)
        }
        var rowsAt1 = -1L
        Seq(1, reps).distinct.foreach { n =>
          val (ef, np, sids) = replicate(n)
          ef.count(); np.count() // materialize outside the timed region
          val (r1, t1) = runOnce(ef, np, sids) // warm
          val (r2, t2) = runOnce(ef, np, sids)
          if (n == 1) rowsAt1 = r2
          // disjoint namespaces: the result must replicate exactly —
          // anything else means replicas leaked into each other's groups
          else assert(r2 == rowsAt1 * n,
            s"expected ${rowsAt1 * n} rows at x$n, got $r2")
          println(f"[profile] cypherscale x$n rows=$r2 ids=${sids.size} " +
            f"warm=$t1%.2f s best=${math.min(t1, t2)}%.2f s " +
            f"per_replica=${math.min(t1, t2) / n}%.3f s")
          ef.unpersist(); np.unpersist()
        }

      case "suffixscale" =>
        // would-it-scale probe for the suffix-bucket substring dedup:
        // documents replicated xN under disjoint per-rep TOKEN namespaces
        // (every token prefixed "r<rep>_"), so each replica's cross-doc
        // span structure replicates without creating cross-replica
        // duplicates. Linear plan => per-row cost ~flat 1x → Nx.
        val np = if (args.length > 2) args(2).toInt else 8
        import graft.ops.Dedup
        val plant = "breaking news the quick brown fox jumps over the " +
          "lazy dog as markets rally across the eastern exchanges"
        val docs1 = docs.select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat(lit(plant), lit(" "), col("text")))
            .otherwise(col("text")).as("text"))
        val repsS = spark.range(0, np).select(col("id").as("rep"))
        val bigS = docs1.crossJoin(repsS)
          .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
            concat_ws(" ", transform(split(col("text"), "\\s+"),
              t => concat(lit("r"), col("rep"), lit("_"), t))).as("text"))
          .repartition(32).localCheckpoint(true)
        val n1s = docs1.count(); val nNs = bigS.count()
        println(s"[profile] suffixscale rows 1x=$n1s ${np}x=$nNs")
        def sspan(d: DataFrame) =
          Dedup.suffixSpanDedup(d, "text", "doc_id", minTokens = 6).count()
        sspan(docs1) // warm codegen
        val t1s = timeRet("suffix dedup 1x") { sspan(docs1) }
        val tNs = timeRet(s"suffix dedup ${np}x") { sspan(bigS) }
        println(f"[profile] per-row us: 1x=${t1s * 1e6 / n1s}%.2f " +
          f"${np}x=${tNs * 1e6 / nNs}%.2f ratio=${tNs * n1s / (t1s * nNs)}%.2f")

      case "tfidfdiag" =>
        // stage decomposition of diversityFilterTfidf on this sfDir's
        // documents: vector build, prefix-filter selectivity, candidate
        // count, verification cost
        import org.apache.spark.sql.expressions.Window
        val idCol = "doc_id"; val textCol = "text"; val threshold = 0.975
        val terms = docs.select(col(idCol),
            explode(expr(s"regexp_extract_all(lower($textCol), " +
              """'\\d+\\.\\d+|[a-z0-9]+', 0)""")).as("tk"))
          .select(col(idCol), col("tk").as("term"))
        val tf = terms.groupBy(col(idCol), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
        val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val dfreq = tf.groupBy(col("term"))
          .agg(count(lit(1)).cast("double").as("dfreq"))
        val weighted = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
          .withColumn("w",
            col("tf") * (log((col("n_docs") + 1) / (col("dfreq") + 1)) + 1))
        val norms = weighted.groupBy(col(idCol))
          .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
        val vec = weighted.join(norms, Seq(idCol))
          .select(col(idCol).as("id"), col("term"),
            (col("w") / col("norm")).as("w")).localCheckpoint(true)
        println(s"[profile] vocab=${dfreq.count()} vecRows=${vec.count()}")
        val maxw = vec.groupBy(col("term")).agg(max(col("w")).as("maxw"))
        val contrib = vec.join(maxw, Seq("term"))
          .withColumn("contrib", col("w") * col("maxw"))
        val cumW = Window.partitionBy("id")
          .orderBy(col("contrib"), col("term"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val indexedOld = contrib
          .withColumn("cum", sum(col("contrib")).over(cumW))
          .filter(col("cum") >= threshold).select(col("term"), col("id"))
        println(s"[profile] indexed(maxw-bound)=${indexedOld.count()}")
        // norm-bound alternative: unindex while cum(w^2) < t^2
        val cumN = Window.partitionBy("id").orderBy(col("w"), col("term"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val indexedNorm = vec
          .withColumn("cum", sum(col("w") * col("w")).over(cumN))
          .filter(col("cum") >= threshold * threshold)
          .select(col("term"), col("id"))
        println(s"[profile] indexed(norm-bound)=${indexedNorm.count()}")
        val postings = vec.select(col("term"), col("id").as("pid"))
        def candCount(ix: DataFrame): Long = ix.join(postings, Seq("term"))
          .filter(col("id") =!= col("pid"))
          .select(least(col("id"), col("pid")).as("id_a"),
            greatest(col("id"), col("pid")).as("id_b"))
          .distinct().count()
        time("cands maxw-bound") { candCount(indexedOld) }
        time("cands norm-bound") { candCount(indexedNorm) }
        time("full op (current)") {
          graft.ops.Dedup.diversityFilterTfidf(docs, textCol, idCol).count()
        }

      case "tfidfscale" =>
        // would-it-scale probe for the exact tfidf diversity: docs
        // replicated xN under disjoint "rep<k> " token prefixes (every
        // token namespaced, so idf mass and near-dup pairs replicate
        // per-namespace instead of cross-colliding). Prefix-filtered
        // AllPairs => candidate pairs grow with true near-dups, per-row
        // cost ~flat.
        val nt = if (args.length > 2) args(2).toInt else 8
        val repsT = spark.range(0, nt).select(col("id").as("rep"))
        val bigT = docs.crossJoin(repsT)
          .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
            // alnum glue ("r3xword"), NOT "r3_word": the tfidf tokenizer
            // splits on underscore, which would leak a shared "r3" token
            // into every doc and collide all replicas into near-dups
            regexp_replace(col("text"), lit("(^|\\s)(\\S)"),
              concat(lit("$1r"), col("rep"), lit("x$2"))).as("text"))
          .repartition(32).localCheckpoint(true)
        val nd1 = docs.count(); val ndN = bigT.count()
        println(s"[profile] tfidfscale rows 1x=$nd1 ${nt}x=$ndN")
        def tdiv(d: DataFrame) =
          graft.ops.Dedup.diversityFilterTfidf(d, "text", "doc_id").count()
        tdiv(docs) // warm
        val td1 = timeRet("tfidf diversity 1x") { tdiv(docs) }
        val tdN = timeRet(s"tfidf diversity ${nt}x") { tdiv(bigT) }
        println(f"[profile] per-row ms: 1x=${td1 * 1e3 / nd1}%.3f " +
          f"${nt}x=${tdN * 1e3 / ndN}%.3f ratio=${tdN * nd1 / (td1 * ndN)}%.2f")

      case "scaleprobe4" =>
        // would-it-scale probe for the final round-7 batch: docs/events
        // replicated xN with disjoint key spaces. Yield/zipf/mix outputs
        // are group-bounded (20 sources), outliers/fill grow linearly —
        // per-row cost should stay ~flat.
        val n4 = if (args.length > 2) args(2).toInt else 8
        val reps4 = spark.range(0, n4).select(col("id").as("rep"))
        val bigDocs4 = docs.crossJoin(reps4)
          .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
            col("text"), col("source"), col("n_chars"))
          .repartition(32).localCheckpoint(true)
        val ev4 = spark.read.parquet(s"$sfDir/events.parquet")
        val bigEv4 = ev4.crossJoin(reps4)
          .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
            (col("event_id") + col("rep") * 1000000000L).as("event_id"),
            col("event_type"), col("value"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .repartition(32).localCheckpoint(true)
        println(s"[profile] scaleprobe4 docs=${bigDocs4.count()} " +
          s"ev=${bigEv4.count()} (${n4}x)")
        import graft.ops.{Dedup, EventAnalytics, Sampling, TextAnalysis}
        def yld(d: DataFrame) =
          Dedup.yieldReport(d, "text", "doc_id", "source").count()
        def zf(d: DataFrame) =
          TextAnalysis.zipfEntropy(d, "text", "source").count()
        def mix(d: DataFrame) = Sampling.targetMixWeighted(d, "doc_id",
          "source", "n_chars",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)).count()
        def out(e: DataFrame) = EventAnalytics.iqrOutliers(e, "event_type",
          "value", "event_id").count()
        def fill(e: DataFrame) = EventAnalytics.forwardFill(
          e.withColumn("v", when(col("event_type") === "purchase",
            col("value"))), "user_id", "ts_us", "v",
          tieBreak = Seq("event_id")).count()
        val ev1x = ev4.select(col("user_id"), col("event_id"),
          col("event_type"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        time(s"dedup yield ${n4}x") { yld(bigDocs4) }
        time("dedup yield 1x") { yld(docs) }
        time(s"zipf entropy ${n4}x") { zf(bigDocs4) }
        time("zipf entropy 1x") { zf(docs) }
        time(s"weighted mix ${n4}x") { mix(bigDocs4) }
        time("weighted mix 1x") { mix(docs) }
        time(s"iqr outliers ${n4}x") { out(bigEv4) }
        time("iqr outliers 1x") { out(ev1x) }
        time(s"forward fill ${n4}x") { fill(bigEv4) }
        time("forward fill 1x") { fill(ev1x) }

      case "scaleprobe3" =>
        // would-it-scale probe for the interval/event/graph batch: events
        // replicated xN with disjoint user spaces; the co-purchase graph
        // replicated xN with disjoint node spaces. Occupancy output is
        // bucket-bounded (counts grow, rows don't); transitions output is
        // |types|²-bounded; the joins/BFS grow linearly in rows — per-row
        // cost should stay ~flat throughout.
        val n = if (args.length > 2) args(2).toInt else 8
        val reps = spark.range(0, n).select(col("id").as("rep"))
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        val bigEv = ev.crossJoin(reps)
          .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
            (col("event_id") + col("rep") * 1000000000L).as("event_id"),
            col("event_type"), col("value"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .repartition(32).localCheckpoint(true)
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val bigInc = li.crossJoin(reps)
          .select((col("l_partkey") + col("rep") * 10000000L).as("pk"),
            (col("l_orderkey") + col("rep") * 100000000L).as("ok"))
          .repartition(32).localCheckpoint(true)
        println(s"[profile] scaleprobe3 ev=${bigEv.count()} " +
          s"inc=${bigInc.count()} (${n}x)")
        import graft.ops.{EventAnalytics, LinkPrediction, TemporalJoins}
        import graft.streaming.Sessionize
        def sessions(e: DataFrame) =
          Sessionize.batchSessions(e, 30, tieBreak = Seq("event_id"))
        def occ(e: DataFrame) = EventAnalytics.occupancy(sessions(e),
          "session_start", "session_end", 3600L * 1000000).count()
        def trans(e: DataFrame) = EventAnalytics.transitions(e, "user_id",
          "ts_us", "event_type").count()
        def anomaly(e: DataFrame) = EventAnalytics.rateAnomalies(e,
          "event_type", "ts_us", 3600L * 1000000, 24).count()
        def ivj(e: DataFrame) = {
          val sess = sessions(e).select(col("user_id"), col("session_seq"),
            col("session_start"), col("session_end"))
          TemporalJoins.intervalJoin(
            sess.filter(col("user_id") % 1000 === 0),
            sess.filter(col("user_id") % 1000 =!= 0),
            "session_start", "session_end", None, 3600L * 1000000).count()
        }
        def jac(inc: DataFrame) = LinkPrediction.jaccardLinks(
          LinkPrediction.projectBipartite(inc, "pk", "ok", 5)
            .select(col("a").as("src"), col("b").as("dst")),
          maxCenterDegree = 20, orientedInput = true).count()
        def close(inc: DataFrame) = {
          val proj = LinkPrediction.projectBipartite(inc, "pk", "ok", 5)
            .select(col("a").as("src"), col("b").as("dst"))
          val seeds = proj.select(col("src").as("node"))
            .filter(col("node") % 997 === 0).distinct()
          graft.byokg.Traversal.harmonicCloseness(proj, seeds, 3,
            undirected = true).count()
        }
        val ev1 = ev.select(col("user_id"), col("event_id"),
          col("event_type"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val inc1 = li.select(col("l_partkey").as("pk"),
          col("l_orderkey").as("ok"))
        time(s"occupancy ${n}x") { occ(bigEv) }
        time("occupancy 1x") { occ(ev1) }
        time(s"transitions ${n}x") { trans(bigEv) }
        time("transitions 1x") { trans(ev1) }
        time(s"rate anomalies ${n}x") { anomaly(bigEv) }
        time("rate anomalies 1x") { anomaly(ev1) }
        time(s"interval join ${n}x") { ivj(bigEv) }
        time("interval join 1x") { ivj(ev1) }
        time(s"jaccard links ${n}x") { jac(bigInc) }
        time("jaccard links 1x") { jac(inc1) }
        time(s"closeness ${n}x") { close(bigInc) }
        time("closeness 1x") { close(inc1) }

      case "scaleprobe2" =>
        // would-it-scale probe for the round-7 operators: inputs replicated
        // xN with disjoint key spaces (so result sizes scale ~linearly too)
        // — per-row cost should stay ~flat if the capped/prefix-filtered
        // shapes hold
        val n = if (args.length > 2) args(2).toInt else 8
        val reps = spark.range(0, n).select(col("id").as("rep"))
        val bigDocs = docs.crossJoin(reps)
          .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
            concat(col("text"), lit(" rep"), col("rep")).as("text"))
          .repartition(32).localCheckpoint(true)
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val bigInc = li.crossJoin(reps)
          .select((col("l_partkey") + col("rep") * 10000000L).as("pk"),
            (col("l_orderkey") + col("rep") * 100000000L).as("ok"))
          .repartition(32).localCheckpoint(true)
        val ev = spark.read.parquet(s"$sfDir/events.parquet")
        val bigEv = ev.crossJoin(reps)
          .select((col("user_id") + col("rep") * 10000000L).as("user_id"),
            col("event_type"), unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .repartition(32).localCheckpoint(true)
        println(s"[profile] scaleprobe2 docs=${bigDocs.count()} " +
          s"inc=${bigInc.count()} ev=${bigEv.count()} (${n}x)")
        import graft.ops.{Dedup, LinkPrediction, EventAnalytics}
        def setsim(d: DataFrame) = Dedup.setSimilarityJoin(
          d, "text", "doc_id", tau = 0.5).count()
        // the production gate's path: 60-bit-hashed elements (longs shuffle
        // and sort at a fraction of the string cost) — build included in
        // the timed region so the comparison is end-to-end
        graft.functions.WordShingles.register(spark)
        def setsimHashed(d: DataFrame) = Dedup.setSimilarityJoinFrom(
          d.select(col("doc_id").as("id"),
            array_distinct(transform(
              graft.functions.WordShingles.shingles(col("text"), 3),
              t => H.h60(t))).as("toks"))
            .localCheckpoint(true), tau = 0.5).count()
        def adamic(inc: DataFrame) = LinkPrediction.adamicAdar(
          LinkPrediction.projectBipartite(inc, "pk", "ok", 5)
            .select(col("a").as("src"), col("b").as("dst")),
          maxCenterDegree = 20, orientedInput = true).count()
        def funnel(e: DataFrame) = EventAnalytics.funnel(e, "user_id",
          "ts_us", "event_type", Seq("view", "click", "purchase")).count()
        time(s"setsim join ${n}x") { setsim(bigDocs) }
        time(s"setsim hashed ${n}x") { setsimHashed(bigDocs) }
        time(s"adamic-adar ${n}x") { adamic(bigInc) }
        time(s"funnel ${n}x") { funnel(bigEv) }
        val ev1 = ev.select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        time("setsim join 1x") { setsim(docs) }
        time("setsim hashed 1x") { setsimHashed(docs) }
        time("adamic-adar 1x") {
          adamic(li.select(col("l_partkey").as("pk"),
            col("l_orderkey").as("ok")))
        }
        time("funnel 1x") { funnel(ev1) }

      case "fullchain" =>
        // decompose q_full_chain's base-checkpoint cost: scan+join, +ids,
        // +derived cols, +checkpoint materialization
        import org.apache.spark.sql.DataFrame
        val ordF = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"))
        val liF = spark.read.parquet(s"$sfDir/lineitem.parquet")
        def joined: DataFrame = liF.join(ordF, col("l_orderkey") === col("o_orderkey"))
        def withId(df: DataFrame): DataFrame = df.select(
          col("o_custkey").as("source_id"), col("l_orderkey").as("topic_id"),
          md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * 100).cast("long"),
            (col("l_quantity") * 100).cast("long"),
            col("l_shipdate").cast("string"))).as("statement_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_shipdate").cast("string")).as("statement"),
          concat(
            when(col("l_returnflag") === "R",
              array((col("l_extendedprice") * 100).cast("long")))
              .otherwise(array().cast("array<long>")),
            when(col("l_quantity") > 25,
              array((col("l_quantity") * 100000).cast("long")))
              .otherwise(array().cast("array<long>"))).as("scores"),
          concat(lit("part:"), col("l_partkey")).as("fact_part"),
          concat(lit("supp:"), col("l_suppkey")).as("fact_supp"),
          col("l_shipdate").cast("string").as("chunk_text"))
        for (rep <- 1 to 2) {
          time(s"rep$rep scan+join") { joined.count() }
          time(s"rep$rep +projection") {
            withId(joined).select(sum(length(col("statement_id")))).collect(); 1L }
          time(s"rep$rep +checkpoint") { withId(joined).localCheckpoint(true).count() }
        }

      case "beamjobs" =>
        // job/stage/task counts per beam query (where scheduling overhead is)
        graft.GraftExtensions.registerAll(spark)
        val gj = graft.queries.Tables.lexicalGraph(spark, sfDir)
        Seq(gj.chunks, gj.topics, gj.topicMentionedIn, gj.statements,
          gj.facts, gj.factSupports, gj.entities, gj.entityRelations,
          gj.topicEmbeddings, gj.topicEntities).foreach(_.count())
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val stages = new java.util.concurrent.atomic.AtomicInteger
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              stages.incrementAndGet()
              tasks.addAndGet(s.stageInfo.numTasks)
            }
          })
        for (q <- Seq("q_beam_topic", "q_beam_chunk", "q_beam_statement")) {
          jobs.set(0); stages.set(0); tasks.set(0)
          time(q) { graft.SparkEntry.queries(q)(spark, sfDir).count() }
          println(s"[profile]   $q jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
        }

      case "pagerank" =>
        // where q_pagerank's time goes: setup vs per-iteration, det vs plain
        val edges = graft.queries.Tables.edges(spark, sfDir)
        edges.count() // warm the cache like Bench does
        time("setup e distinct") {
          edges.select(col("src"), col("dst")).distinct().count()
        }
        for (det <- Seq(false, true); it <- Seq(1, 2, 3)) {
          time(s"pageRank iters=$it det=$det") {
            graft.byokg.Traversal.pageRank(edges, it, deterministic = det)
              .count()
          }
        }

      case "qjobs" =>
        // per-stage durations of one query (args(2)), slowest first
        graft.GraftExtensions.registerAll(spark)
        val qn = if (args.length > 2) args(2) else "q_full_chain"
        val infos = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val dur = (for (a <- si.completionTime; b <- si.submissionTime)
                yield a - b).getOrElse(-1L)
              infos.add((si.stageId, si.name.takeWhile(_ != '\n').take(60),
                dur, si.numTasks))
            }
          })
        time(s"$qn cold") { graft.SparkEntry.queries(qn)(spark, sfDir).count() }
        infos.clear()
        time(s"$qn warm") { graft.SparkEntry.queries(qn)(spark, sfDir).count() }
        Thread.sleep(500)
        infos.toArray.map(_.asInstanceOf[(Int, String, Long, Int)])
          .sortBy(-_._3).take(25).foreach { case (id, nm, dur, nt) =>
            println(f"[profile]   stage $id%4d ${dur / 1000.0}%7.2f s tasks=$nt%3d  $nm")
          }

      case "chainsteps" =>
        // cumulative cost of q_full_chain's committed shape: the narrowed
        // checkpoint base, fused retriever explode, rank-first truncation,
        // deferred populateStatementStrs, and the formatting tail — kept in
        // sync with queries/ProcessorQueries.scala q_full_chain.
        graft.GraftExtensions.registerAll(spark)
        import graft.retrieve.Processors
        import graft.queries.{Tables => T2}
        val ordC = T2.t(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        var baseC: org.apache.spark.sql.DataFrame = null
        time("base checkpoint") {
          baseC = T2.t(spark, sfDir, "lineitem")
            .join(ordC, col("l_orderkey") === col("o_orderkey"))
            .select(col("o_custkey").as("source_id"),
              col("l_orderkey").as("topic_id"),
              md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
                col("l_partkey"), col("l_suppkey"),
                (col("l_extendedprice") * 100).cast("long"),
                (col("l_quantity") * 100).cast("long"),
                col("l_shipdate").cast("string"))).as("statement_id"),
              concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
                col("l_shipdate").cast("string")).as("statement"),
              concat(
                when(col("l_returnflag") === "R",
                  array((col("l_extendedprice") * 100).cast("long")))
                  .otherwise(array().cast("array<long>")),
                when(col("l_quantity") > 25,
                  array((col("l_quantity") * 100000).cast("long")))
                  .otherwise(array().cast("array<long>"))).as("scores"),
              concat(lit("part:"), col("l_partkey")).as("fact_part"),
              concat(lit("supp:"), col("l_suppkey")).as("fact_supp"),
              col("l_shipdate").cast("string").as("chunk_text"))
            .localCheckpoint(true)
          baseC.count()
        }
        val sourcesC = T2.t(spark, sfDir, "customer").select(
          col("c_custkey").as("source_id"),
          map(lit("name"), col("c_name"), lit("segment"), col("c_mktsegment"))
            .as("metadata"),
          col("c_mktsegment").as("segment"))
        val unionedC = baseC.select(col("source_id"), col("topic_id"),
            col("statement_id"), explode(col("scores")).as("score"))
          .withColumn("score", col("score").cast("double"))
        val steps: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
          "dedup" -> Processors.dedupResults,
          "disagg" -> Processors.disaggregateResults,
          "filterMeta" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.filterByMetadata(df, sourcesC,
              graft.filter.FilterAst.Pred("segment",
                graft.filter.FilterAst.Ne, "FURNITURE"))),
          "rerank" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.rerankStatements(df, None)),
          "prune" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.pruneStatements(df, 0.05)),
          "rescore" -> Processors.rescoreResults,
          "truncRank" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.truncateRankResults(df, 10)),
          "truncStmts" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.truncateStatements(df, 3)),
          "checkpoint" -> ((df: org.apache.spark.sql.DataFrame) =>
            df.localCheckpoint(true)),
          // fused enrichment (matches the committed q_full_chain shape):
          // one semi-join bounds the base to the survivors, a tiny eager
          // checkpoint feeds text reattach + fact strs + chunk metadata
          "enrich3" -> ((df: org.apache.spark.sql.DataFrame) => {
            val surv = broadcast(df.select("statement_id").distinct())
            val survBase = baseC
              .join(surv, Seq("statement_id"), "left_semi")
              .localCheckpoint(true)
            val stmtText = survBase.select(col("statement_id"), col("statement"))
              .dropDuplicates("statement_id")
            val withText = df.join(broadcast(stmtText), Seq("statement_id"))
              .withColumn("chunk_id", col("statement_id"))
            val survFacts = survBase.select(col("statement_id"),
              explode(array(col("fact_part"), col("fact_supp")))
                .as("fact_value"))
            val populated = Processors.populateStatementStrs(withText, survFacts)
            val survChunks = survBase
              .select(col("statement_id").as("chunk_id"),
                col("chunk_text").as("text")).distinct()
            Processors.updateChunkMetadata(populated, survChunks)
          }),
          "clearScores" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.clearScores(df)),
          "stmtsToStrings" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.statementsToStrings(df, includeFacts = true)),
          "simplify" -> ((df: org.apache.spark.sql.DataFrame) =>
            Processors.simplifySingleTopicResults(df)),
          "clearChunks" -> Processors.clearChunks,
          "formatTail" -> ((df: org.apache.spark.sql.DataFrame) => {
            val cleanC = Processors.removeVersioningMetadata(sourcesC)
            df.withColumn("topic", concat(lit("order-"), col("topic_id")))
              .transform(Processors.clearTopicIds)
              .join(Processors.formatSources(cleanC)
                .select("source_id", "source_str"), Seq("source_id"), "left")
              .orderBy(col("source_rank"), col("topic"))
          })
        )
        for (rep <- 1 to 2; k <- 1 to steps.length) {
          val out = steps.take(k).foldLeft(unionedC)((df, p) => p._2(df))
          time(s"rep$rep +${steps(k - 1)._1}") { out.count() }
        }

      case "beam" =>
        // where beam time goes: graph warm, seeds, then per-query totals
        graft.GraftExtensions.registerAll(spark)
        val g = graft.queries.Tables.lexicalGraph(spark, sfDir)
        time("warm graph") {
          Seq(g.chunks, g.topics, g.topicMentionedIn, g.statements, g.facts,
            g.factSupports, g.entities, g.entityRelations,
            g.topicEmbeddings, g.topicEntities).map(_.count()).sum
        }
        for (q <- Seq("q_beam_topic", "q_beam_chunk", "q_beam_statement");
             rep <- 1 to 2)
          time(s"$q#$rep") { graft.SparkEntry.queries(q)(spark, sfDir).count() }

      case "beamconf" =>
        // config levers for driver-loop queries: AQE + shuffle partitions
        graft.GraftExtensions.registerAll(spark)
        val g2 = graft.queries.Tables.lexicalGraph(spark, sfDir)
        time("warm graph") {
          Seq(g2.chunks, g2.topics, g2.topicMentionedIn, g2.statements,
            g2.facts, g2.factSupports, g2.entities, g2.entityRelations,
            g2.topicEmbeddings, g2.topicEntities).map(_.count()).sum
        }
        // the beams now pin their own loop conf; sweep the loop partition
        // count via the system property override
        for (parts <- Seq(8, 4, 2, 1); rep <- 1 to 2) {
          System.setProperty("graft.loop.partitions", parts.toString)
          time(s"topic loopP=$parts#$rep") {
            graft.SparkEntry.queries("q_beam_topic")(spark, sfDir).count()
          }
          time(s"chunk loopP=$parts#$rep") {
            graft.SparkEntry.queries("q_beam_chunk")(spark, sfDir).count()
          }
        }
        System.clearProperty("graft.loop.partitions")

      case "graphprobe" =>
        // would-it-scale probe for the traversal path: the derived edge
        // frame replicated xN with id-prefixed nodes (disjoint replicas, so
        // result sizes scale linearly and per-row cost should stay ~flat);
        // probes k-hop and BFS over the union
        val n = if (args.length > 2) args(2).toInt else 16
        import graft.byokg.Traversal
        val e1 = graft.queries.Tables.undirectedEdges(spark, sfDir)
        e1.count()
        val reps = spark.range(0, n).select(col("id").cast("int").as("rep"))
        val big = e1.crossJoin(reps)
          .select(concat(col("rep"), lit("#"), col("src")).as("src"),
            concat(col("rep"), lit("#"), col("dst")).as("dst"), col("label"))
          .repartition(32).localCheckpoint(true)
        println(s"[profile] graphprobe edges=${big.count()} (${n}x)")
        def seeds(df: DataFrame, pref: String) =
          spark.createDataFrame(java.util.Arrays.asList(
            org.apache.spark.sql.Row(s"${pref}c:0")),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("node",
                org.apache.spark.sql.types.StringType))))
        val allSeeds = spark.createDataFrame(java.util.Arrays.asList(
          (0 until n).map(r =>
            org.apache.spark.sql.Row(s"$r#c:0")): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.StringType))))
        time(s"bfs dist<=3, $n seeds, ${n}x edges") {
          Traversal.shortestDistances(big, allSeeds, 3).count()
        }
        time("bfs dist<=3, 1 seed, 1x edges") {
          Traversal.shortestDistances(e1, seeds(e1, ""), 3).count()
        }

      case "qscans" =>
        // job/stage/task census for one named query — the re-derivation
        // detector: a chain whose broadcast subtrees re-execute lineage
        // shows up as extra jobs re-running the same scan stages. Run the
        // query once untimed (warm layouts), then count one execution.
        val qname = if (args.length > 2) args(2) else "q_full_chain"
        graft.GraftExtensions.registerAll(spark)
        graft.SparkEntry.queries(qname)(spark, sfDir).count() // warm
        @volatile var jobs = 0
        @volatile var stages = 0
        @volatile var tasks = 0L
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs += 1
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = { stages += 1; tasks += s.stageInfo.numTasks }
        }
        spark.sparkContext.addSparkListener(listener)
        val tq = timeRet(qname) {
          graft.SparkEntry.queries(qname)(spark, sfDir).count()
        }
        Thread.sleep(2000) // listener bus is async; let it drain
        spark.sparkContext.removeSparkListener(listener)
        println(f"[profile] $qname jobs=$jobs stages=$stages " +
          f"tasks=$tasks in $tq%.2f s")

      case "betweenness" =>
        // would-it-scale probe for sampled Brandes: disjoint id-prefixed
        // edge replicas (xN), one seed per replica — result sizes scale
        // linearly, per-row cost should stay ~flat (all shuffles key on
        // (seed, node); the K seeds batch through one frontier)
        val n = if (args.length > 2) args(2).toInt else 8
        import graft.byokg.Traversal
        val e1 = graft.queries.Tables.undirectedEdges(spark, sfDir)
        e1.count()
        val reps = spark.range(0, n).select(col("id").cast("int").as("rep"))
        val big = e1.crossJoin(reps)
          .select(concat(col("rep"), lit("#"), col("src")).as("src"),
            concat(col("rep"), lit("#"), col("dst")).as("dst"), col("label"))
          .repartition(32).localCheckpoint(true)
        println(s"[profile] betweenness edges=${big.count()} (${n}x)")
        import spark.implicits._
        def sf(ns: Seq[String]) =
          ns.toDF("node").select(col("node").as("seed"), col("node"))
        val s1 = sf(Seq("c:1"))
        val sN = sf((0 until n).map(r => s"$r#c:1"))
        val t1 = timeRet("betweenness 1 seed, 1x") {
          Traversal.brandesBetweenness(e1, s1, 3).count()
        }
        val tN = timeRet(s"betweenness $n seeds, ${n}x") {
          Traversal.brandesBetweenness(big, sN, 3).count()
        }
        println(f"[profile] ratio (xN time / x1 time) = ${tN / t1}%.2f " +
          s"over ${n}x data+seeds")

      case "fullchaindiag" =>
        // segment decomposition of q_full_chain: head (explode + dedup +
        // topic window + metadata filter, to the first checkpoint), middle
        // (rerank/prune/rescore/rank-truncate/statement-truncate, to the
        // second checkpoint), tail (enrichment + formatting + final join).
        // Mirrors the query's structure in queries/ProcessorQueries.scala.
        import graft.retrieve.Processors
        import graft.queries.Tables
        graft.GraftExtensions.registerAll(spark)
        val baseS = Tables.retrievalStatements(spark, sfDir)
        baseS.count() // warm store layout
        val sources = spark.read.parquet(s"$sfDir/customer.parquet").select(
          col("c_custkey").as("source_id"),
          map(lit("name"), col("c_name"), lit("segment"), col("c_mktsegment"),
            lit("__graft__versioning__valid_from__"), lit("0"),
            lit("__graft__versioning__build_timestamp__"), lit("0"))
            .as("metadata"),
          col("c_mktsegment").as("segment"))
        val cleanSources = Processors.removeVersioningMetadata(sources)
        def head() = {
          val unioned = baseS.select(col("source_id"), col("topic_id"),
              col("statement_id"), explode(col("scores")).as("score"))
            .withColumn("score", col("score").cast("double"))
          Processors.filterByMetadata(
            Processors.disaggregateResults(Processors.dedupResults(unioned)),
            cleanSources,
            graft.filter.FilterAst.Pred("segment",
              graft.filter.FilterAst.Ne, "FURNITURE"))
            .localCheckpoint(true)
        }
        head() // warm codegen
        var h: org.apache.spark.sql.DataFrame = null
        time("head (to checkpoint 1)") { h = head(); h.count() }
        time("  mid:max-agg") {
          h.agg(max("score")).collect(); 1L
        }
        val pruned = Processors.pruneStatements(h, 0.05)
        time("  mid:prune+count") { pruned.count() }
        time("  mid:perTopic groupBy") {
          pruned.groupBy("source_id", "topic_id")
            .agg(avg("score").as("m")).count()
        }
        time("  mid:rescoreAndRank") {
          Processors.rescoreAndRank(pruned, 10).count()
        }
        var m: org.apache.spark.sql.DataFrame = null
        time("middle (to checkpoint 2)") {
          m = Processors.truncateStatements(
            Processors.rescoreAndRank(
              Processors.pruneStatements(
                Processors.rerankStatements(h, None), 0.05), 10), 3)
            .localCheckpoint(true)
          m.count()
        }
        time("tail (enrich + format)") {
          val surv = broadcast(m.select("statement_id").distinct())
          val survBase = baseS
            .join(surv, Seq("statement_id"), "left_semi")
            .localCheckpoint(true)
          val stmtText = survBase.select(col("statement_id"), col("statement"))
            .dropDuplicates("statement_id")
          val withText = m.join(broadcast(stmtText), Seq("statement_id"))
            .withColumn("chunk_id", col("statement_id"))
          val survFacts = survBase.select(col("statement_id"),
            explode(array(col("fact_part"), col("fact_supp")))
              .as("fact_value"))
          val populated = Processors.populateStatementStrs(withText, survFacts)
          val survChunks = survBase
            .select(col("statement_id").as("chunk_id"),
              col("chunk_text").as("text")).distinct()
          val tailDf = Processors.clearTopicIds(
            Processors.clearChunks(
              Processors.simplifySingleTopicResults(
                Processors.statementsToStrings(
                  Processors.clearScores(
                    Processors.updateChunkMetadata(populated, survChunks)),
                  includeFacts = true)))
              .withColumn("topic", concat(lit("order-"), col("topic_id"))))
          tailDf.join(Processors.formatSources(cleanSources)
              .select("source_id", "source_str"), Seq("source_id"), "left")
            .count()
        }

      case "tenantsummary" =>
        // build/query split for q_tenant_summary: the classified-graph
        // builds (t0 + the src0-subset t1) are ingest-time material; the
        // query is joins + groupBy + TopKAgg over the cached tables. The
        // round-6 bench timed the t1 BUILD inside the query (warmup only
        // materialized t0) — this probe keeps the two costs visible.
        graft.GraftExtensions.registerAll(spark)
        time("build+materialize t0 graph") {
          val g = graft.queries.Tables.lexicalGraphClassified(spark, sfDir)
          Seq(g.entities, g.entityRelations, g.facts).map(_.count()).sum
        }
        time("build+materialize t1 graph") {
          val g = graft.queries.Tables.lexicalGraphClassifiedT1(spark, sfDir)
          Seq(g.entities, g.entityRelations).map(_.count()).sum
        }
        for (rep <- 1 to 3)
          time(s"tenantClassPaths query#$rep") {
            graft.SparkEntry.queries("q_tenant_summary")(spark, sfDir).count()
          }

      case "phashscale" =>
        // Banded-hamming-LSH scale probe for the image near-dup join.
        // The structural law: a (bands, 56/bands-bit) banding has an
        // expected RANDOM band-collision floor of N²·bands/2^(56/bands)
        // pairs — at 4×14 bits that floor turns quadratic once N ≫ 2^14,
        // at 2×28 bits it stays ≈0 up to N ≈ 2^28. So the bands knob is
        // the corpus-size dial: more bands = higher hamming budget
        // (≤ bands−1) but a lower collision ceiling; the probe prints
        // both configs so the trade is measured, not asserted. Planted
        // twins (every 100th id) set the true-output floor; the wide
        // synth family keeps organic parameter collisions negligible.
        for (n <- Seq(5000, 10000, 20000)) {
          val ids = spark.range(n).select(col("id").as("doc_id"),
            concat(lit("synthetic text payload "), col("id")).as("text"))
          val hashed = graft.ops.Multimodal.dHash56(
              graft.ops.Multimodal.synthGradientPngMedia(
                ids, "doc_id", "text", variantEvery = 100,
                wideParams = true))
            .localCheckpoint(true)
          val nImgs = hashed.count()
          val brute = nImgs * (nImgs - 1) / 2
          for ((bands, maxHam) <- Seq((4, 3), (2, 1))) {
            val bits = 56 / bands
            val mask = (1L << bits) - 1
            // band-bucket pair mass = what the equi-join emits pre-filter
            val bandPairs = hashed.select(explode(array((0 until bands).map {
                k => concat(lit(s"$k#"),
                  (shiftright(col("phash"), bits * k) bitwiseAND mask)
                    .cast("string"))
              }: _*)).as("bk"))
              .groupBy("bk").agg(count(lit(1)).as("c"))
              .agg(sum(expr("c * (c - 1) DIV 2"))).head().getLong(0)
            var pairs = 0L
            time(s"neardup N=$nImgs bands=$bands h<=$maxHam") {
              pairs = graft.ops.Multimodal
                .phashNearDup(hashed, maxHam, bands).count()
              pairs
            }
            println(f"[profile]   N=$nImgs%6d bands=$bands brute=$brute%12d " +
              f"bandPairs=$bandPairs%9d (${bandPairs * 100.0 / brute}%.5f%% " +
              f"of brute) nearDups=$pairs%7d")
          }
        }

      case "setsimskew" =>
        // Zipf-skew probe for the set-similarity prefix join (the 100 TB
        // failure mode the AllPairs papers warn about): a deterministic
        // harmonic corpus — doc i's element set is {k in 1..V : i % k == 0},
        // so element k's doc frequency is exactly N/k (Zipf exponent 1,
        // with a maximally hot head: element 1 is in EVERY doc). The pass
        // criterion (measured numbers in Dedup.setSimilarityCandidates's
        // doc): candidates a small stable fraction of the N²/2 space, and
        // on the dup-heavy variant bounded by a small multiple of the TRUE
        // output — not candidates ∝ hot-token df² (which is what an
        // unordered prefix would produce).
        // Two corpora per N: (a) the raw harmonic corpus, which is
        // DUP-HEAVY by construction (every prime i > V has the identical
        // set {1}) — here candidates should track the TRUE output size,
        // not the N²/2 space; (b) the same sets salted with two per-doc
        // unique elements, which kills the true near-dups — here the hot
        // head tokens are pure false-candidate bait and the prefix order
        // must keep candidates near zero.
        val vocab = 256
        for (nDocs <- Seq(4000, 8000, 16000);
             (label, salt) <- Seq("dup-heavy" -> false, "salted" -> true)) {
          val divisors = filter(sequence(lit(1L), lit(vocab.toLong)),
            k => col("id") % k === 0)
          val sets = if (salt)
            concat(divisors, array(col("id") + 1000000L, col("id") + 2000000L))
          else divisors
          val toks = spark.range(1, nDocs + 1)
            .select(col("id"), sets.as("toks"))
            .repartition(32).localCheckpoint(true)
          toks.count()
          val brute = nDocs.toLong * (nDocs - 1) / 2
          // all-token join size (what a prefix-less join would emit,
          // pair multiplicity included): sum df*(df-1)/2 — cheap aggregate
          val allTok = toks.select(explode(col("toks")).as("t"))
            .groupBy("t").agg(count(lit(1)).as("df"))
            .agg(sum(expr("df * (df - 1) DIV 2"))).head().getLong(0)
          var cands = 0L
          var real = 0L
          time(s"prefix candidates $label N=$nDocs") {
            cands = graft.ops.Dedup
              .setSimilarityCandidates(toks, tau = 0.6).count()
            cands
          }
          time(s"full setsim join $label N=$nDocs") {
            real = graft.ops.Dedup
              .setSimilarityJoinFrom(toks, tau = 0.6).count()
            real
          }
          println(f"[profile]   $label%-9s N=$nDocs%6d brute=$brute%12d " +
            f"allTokenJoin=$allTok%12d prefixCands=$cands%9d " +
            f"(${cands * 100.0 / brute}%.4f%% of brute) truePairs=$real%9d")
        }

      case "explain" =>
        // plan audit: dump formatted physical plans for selected queries
        val names = if (args.length > 2) args(2).split(",").toSeq
          else Seq("q_metadata_filter", "q_vector_topk", "q_join_chain",
            "q_agg_sums", "q_central_materialization", "q_minhash_lsh")
        graft.GraftExtensions.registerAll(spark)
        names.foreach { n =>
          println(s"===== $n =====")
          graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
        }
      case _ => sys.error(s"unknown profile target $what")
    }
    spark.stop()
  }
}
