package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.index.{Checkpoint, VersionManager}
import graft.ops.Multimodal
import graft.streaming.Sessionize

/**
 * Index-maintenance, sessionization, multitenancy and multimodal inventory
 * (SURVEY.md §2.1 DeleteSources, §2.8 versioning, §2.10 checkpoint/streaming,
 * §2.12 multi-tenancy; extended multimodal ops).
 */
object MaintenanceQueries {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // extended: small-file compaction planning (index.Compaction) — the
    // deterministic running-total bin assignment, gated here over a
    // synthetic file-stats frame derived from documents (doc_id as path,
    // n_chars as bytes) so the window math replays in SQL; the filesystem
    // listing + rewrite halves are spec-tested (CompactionSpec).
    "q_compaction_plan" -> ((s, dir) => {
      val files = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("bytes"))
      graft.index.Compaction.assignBins(files, "doc_id", "bytes",
          targetBytes = 50000L)
        .orderBy(col("bin"), col("doc_id"))
    }),

    // §2.10 sessionization (gaps-and-islands; the streaming twin lives in
    // graft.streaming.Sessionize.streamingSessions and is spec-tested).
    "q_sessionize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      Sessionize.batchSessions(withUs, gapMinutes = 30)
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // extended: forward fill — each event carries the user's latest
    // purchase value at-or-before it (LOCF gap filling; one user-keyed
    // running window, EventAnalytics.forwardFill).
    "q_forward_fill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.withColumn("ts_us", Tables.epochMicros(ev))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("event_type") === "purchase", col("value")).as("v"))
      graft.ops.EventAnalytics.forwardFill(base, "user_id", "ts_us", "v",
          tieBreak = Seq("event_id"))
        .orderBy(col("event_id"))
    }),

    // extended: windowed funnel — the plain funnel with a conversion
    // window: each step must land within 3 days of the user's previous
    // step time (EventAnalytics.funnel maxGapMicros).
    "q_funnel_windowed" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      graft.ops.EventAnalytics.funnel(withUs, "user_id", "ts_us",
          "event_type", Seq("view", "click", "purchase"),
          maxGapMicros = Some(3L * 24 * 3600 * 1000000))
        .orderBy(col("step_idx"))
    }),

    // extended: Tukey-fence outliers on the event value per type — exact
    // quartiles (percentile ≡ quantile_cont), |types|-row broadcast
    // bounds, one codegen detection scan (EventAnalytics.iqrOutliers).
    "q_value_outliers" -> ((s, dir) => {
      graft.ops.EventAnalytics.iqrOutliers(t(s, dir, "events"),
          "event_type", "value", "event_id")
        .orderBy(col("id"))
    }),

    // extended: event-type transition matrix — per-user consecutive-pair
    // counts + per-from probabilities (EventAnalytics.transitions; the
    // user-keyed window is the only event-scale shuffle).
    "q_transitions" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      graft.ops.EventAnalytics.transitions(withUs, "user_id", "ts_us",
          "event_type")
        .orderBy(col("from_type"), col("to_type"))
    }),

    // extended: trailing-window rate anomalies — each (type, hour)'s event
    // count z-scored against the preceding 24 observed hours; exact BIGINT
    // window sums, fixed-order IEEE score (EventAnalytics.rateAnomalies).
    "q_rate_anomaly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      graft.ops.EventAnalytics.rateAnomalies(withUs, "event_type", "ts_us",
          bucketMicros = 3600L * 1000000, trailing = 24, minPrev = 5)
        .orderBy(col("type"), col("bucket"))
    }),

    // extended: interval occupancy — sessions-per-hour concurrency curve
    // over the sessionize output: one explode + one count, no self-join
    // (ops.EventAnalytics.occupancy; span-capped like rangeJoin).
    "q_concurrency" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      val sessions = Sessionize.batchSessions(withUs, gapMinutes = 30)
      graft.ops.EventAnalytics.occupancy(sessions, "session_start",
          "session_end", bucketMicros = 3600L * 1000000)
        .select(col("bucket"), col("bucket_start_us"), col("active"))
        .orderBy(col("bucket"))
    }),

    // extended: interval-overlap join — cross-user concurrent session
    // pairs via the same bin equi-join discipline as rangeJoin, deduped
    // to each pair's unique meeting bin (no distinct shuffle).
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val withUs = ev.withColumn("ts_us", Tables.epochMicros(ev))
      val sessions = Sessionize.batchSessions(withUs, gapMinutes = 30)
        .select(col("user_id"), col("session_seq"),
          col("session_start"), col("session_end"))
      graft.ops.TemporalJoins.intervalJoin(
          sessions.filter(col("user_id") % 100 === 0),
          sessions.filter(col("user_id") % 100 =!= 0),
          "session_start", "session_end", key = None,
          binMicros = 3600L * 1000000)
        .select(col("a_user_id"), col("a_session_seq"), col("b_user_id"),
          col("b_session_seq"), col("overlap_us"))
        .orderBy(col("a_user_id"), col("a_session_seq"), col("b_user_id"),
          col("b_session_seq"))
    }),

    // extended: as-of join (merge_asof backward semantics) — every purchase
    // event picks the user's latest view at-or-before it. Implemented as
    // ONE key-partitioned backward range window over the unioned stream,
    // not a join (ops.TemporalJoins.asofJoin).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.withColumn("ts_us", Tables.epochMicros(ev))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      // right side deduped per (user, ts): max value — tie-free both engines
      val views = base.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("vvalue"))
      graft.ops.TemporalJoins.asofJoin(purchases, views, "user_id",
        "ts_us", "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("_asof._ts").as("view_ts"),
          col("_asof.vvalue").as("view_value"))
        .orderBy(col("event_id"))
    }),

    // extended: range (interval) join — clicks landing inside the 6-hour
    // window after a same-user purchase, via time-bin bucketing (a plain
    // equi-join on (user, bin) + exact post-filter; no range cross product).
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.withColumn("ts_us", Tables.epochMicros(ev))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_us"))
      val windows = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_us").as("w_start"),
          (col("ts_us") + lit(21600000000L)).as("w_end"))
      graft.ops.TemporalJoins.rangeJoin(clicks, "ts_us", windows,
        "w_start", "w_end", key = Some("user_id"), binMicros = 21600000000L)
        .select(col("click_id"), col("purchase_id"),
          clicks("user_id").as("user_id"), col("ts_us"), col("w_start"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // §2.8 SCD-2 merge on re-ingest via the VersionManager module: documents
    // re-keyed so each vid has two versions.
    "q_version_merge" -> ((s, dir) => {
      val versions = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 250).as("vid"),
          (col("doc_id") * 1000).as("valid_from"))
      VersionManager.mergeVersions(versions, Seq("vid"), "valid_from",
        tieBreak = Seq("doc_id"))
        .select(col("vid"), col("doc_id"), col("valid_from"), col("valid_to"))
        .orderBy(col("vid"), col("valid_from"))
    }),

    // extended: snapshot DIFF between two as-of times over the SCD-2 frame —
    // ONE conditional-max_by aggregate, no self-join (VersionManager
    // .snapshotDiff). documents re-keyed into ≥2 versions per vid; version 1
    // tombstones every 7th vid so all three change classes appear.
    "q_version_diff" -> ((s, dir) => {
      val versions = t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 250).as("vid"),
          (expr("doc_id DIV 250") * 300000L + (col("doc_id") % 250) * 1000L)
            .as("valid_from"),
          (expr("doc_id DIV 250") === 1 &&
            (col("doc_id") % 250) % 7 === 0).as("is_del"))
      VersionManager.snapshotDiff(versions, Seq("vid"), "valid_from",
          "doc_id", t1 = 125000L, t2 = 450000L, tombstoneCol = Some("is_del"))
        .orderBy(col("vid"))
    }),

    // extended: one-pass per-column dataset profile (ops.Profiling) — the
    // dataset-card numbers. Exact distincts here for the oracle gate; the
    // 100 TB path flips exact=false (HLL, single pass; ProfilingSpec).
    "q_column_profile" -> ((s, dir) =>
      graft.ops.Profiling.columnProfile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))),

    // §2.8 latest-version scan (version_manager latest ORDER BY valid_from DESC).
    "q_version_latest" -> ((s, dir) => {
      val versions = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          Tables.epochMs(col("o_orderdate")).as("valid_from"))
      VersionManager.latestVersions(versions, Seq("o_custkey"), "valid_from",
        tieBreak = Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("valid_from"))
        .orderBy(col("o_custkey"))
    }),

    // §2.1 DeleteSources cascade + orphan GC on the TPC-H lineage mapping
    // (customers=sources, orders=chunks, lineitems=statements, parts=entities):
    // delete nation-0 customers, return the parts that survive GC.
    "q_delete_cascade" -> ((s, dir) => {
      val delCustomers = t(s, dir, "customer")
        .filter(col("c_nationkey") === 0).select(col("c_custkey"))
      val liveOrders = t(s, dir, "orders")
        .join(broadcast(delCustomers), col("o_custkey") === col("c_custkey"),
          "left_anti")
      val liveParts = t(s, dir, "lineitem")
        .join(liveOrders.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_partkey")).distinct()
      t(s, dir, "part")
        .join(liveParts, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // §2.10 checkpoint: anti-join a new batch against processed ids.
    "q_checkpoint_filter" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val processed = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"))
      val batch = orders.filter(col("o_orderdate") >= lit("2000-01-01"))
      Checkpoint.filterNew(batch, processed, "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.12 multi-tenancy: tenant column discipline — scoped aggregate.
    "q_multitenant_scope" -> ((s, dir) => {
      val tenant = 3
      t(s, dir, "customer").filter(col("c_nationkey") === tenant)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // §2.4 var-length 0..1 hop: seed statements union their PREVIOUS neighbor
    // (entity_based_search's `[:PREVIOUS*0..1]` as union of 0- and 1-hop).
    "q_varlength_hop01" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_extendedprice"))
      val withPrev = li.withColumn("prev_ln", lag(col("l_linenumber"), 1).over(w))
        .withColumn("prev_pk", lag(col("l_partkey"), 1).over(w))
        .withColumn("prev_price", lag(col("l_extendedprice"), 1).over(w))
      val seeds = withPrev.join(
        broadcast(t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val hop0 = seeds.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
      val hop1 = seeds.where(col("prev_ln").isNotNull)
        .select(col("l_orderkey"), col("prev_ln").as("l_linenumber"),
          col("prev_pk").as("l_partkey"), col("prev_price").as("l_extendedprice"))
      hop0.union(hop1).distinct()
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
    }),

    // §2.4 bounded var-length 1..2 paths between entity sets over an
    // undirected co-occurrence relation (multi-entity path search).
    "q_varlength_paths" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val starts = li.filter(col("l_orderkey") === 1)
        .select(col("l_partkey").as("a")).distinct()
      val ends = li.filter(col("l_orderkey") === 2)
        .select(col("l_partkey").as("b")).distinct()
      // Both hops probe the co-occurrence relation only from a known (tiny)
      // endpoint set, so the endpoint restriction is pushed INTO the
      // co-occurrence build: the full part-part graph (O(sum deg^2) pairs —
      // quadratic blowup at 100 TB) is never materialized.
      val e1 = li.join(broadcast(starts), col("l_partkey") === col("a"))
        .select(col("l_orderkey"), col("a"))
        .join(li, Seq("l_orderkey"))
        .filter(col("a") =!= col("l_partkey"))
        .select(col("a"), col("l_partkey").as("b")).distinct()
      val co2End = li.join(broadcast(ends), col("l_partkey") === col("b"))
        .select(col("l_orderkey"), col("b"))
        .join(li, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("b"))
        .select(col("l_partkey").as("m"), col("b")).distinct()
      val p1 = e1.join(broadcast(ends), Seq("b"))
        .select(array(col("a"), col("b")).as("nodes"))
      val p2 = e1.select(col("a"), col("b").as("m"))
        .join(co2End, Seq("m"))
        .filter(col("a") =!= col("m") && col("m") =!= col("b"))
        .select(array(col("a"), col("m"), col("b")).as("nodes"))
      p1.union(p2).select(explode(col("nodes")).as("part_node")).distinct()
        .orderBy(col("part_node"))
    }),

    // extended: multimodal binary columns + stub decode via mapPartitions —
    // the Spark-side plumbing (schema, batching, null passthrough) is real.
    "q_multimodal_stub" -> ((s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").withColumn("bytes", encode(col("text"), "UTF-8")),
        "doc_id", "bytes", "image")
      Multimodal.decodeFeatures(media, featureDim = 16)
        .select(col("media_id"), col("n_bytes"),
          col("features").getItem(0).as("f0"),
          col("features").getItem(7).as("f7"),
          col("features").getItem(15).as("f15"))
        .orderBy(col("media_id").cast("long"))
    }),

    // / extended: REAL image decode — synthPngMedia writes actual PNG bytes
    // (javax.imageio) from md5-derived checkerboard parameters, decodeImage
    // reads them back; the oracle recomputes every feature analytically from
    // the same md5, so a wrong pixel walk / channel order / dimension parse
    // hash-fails.
    "q_multimodal_decode" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Multimodal.decodeImage(Multimodal.synthPngMedia(docs, "doc_id", "text"))
        .select(col("media_id"), col("width"), col("height"), col("channels"),
          round(col("mean_r"), 6).as("mean_r"),
          round(col("mean_g"), 6).as("mean_g"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("mean_luma"), 6).as("mean_luma"))
        .orderBy(col("media_id").cast("long"))
    }),

    // extended: REAL audio decode — synthWavMedia writes actual RIFF/WAVE
    // PCM16LE bytes (javax.sound.sampled) from md5-derived sample cycles,
    // decodeAudio reads them back; the oracle replays every stat with
    // integer cycle math (15-byte sample cycle → full-cycles + remainder),
    // so a wrong endianness / header parse / sample walk hash-fails.
    "q_audio_decode" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Multimodal.decodeAudio(Multimodal.synthWavMedia(docs, "doc_id", "text"))
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("duration_ms"),
          round(col("mean_amp"), 6).as("mean_amp"),
          round(col("rms"), 6).as("rms"), col("peak"))
        .orderBy(col("media_id").cast("long"))
    }),

    // extended: 56-bit perceptual dHash over REAL decoded gradient pngs —
    // the LAION-style image fingerprint. Every 7th doc also carries a
    // near-duplicate twin (one sampled pixel shifted), and the oracle
    // replays the whole pipeline (gradient → 8×8 NN sample → 7×8
    // comparison bits → packed BIGINT) from md5 hex arithmetic, so a
    // wrong sample coordinate, luma weight or bit order hash-fails.
    "q_image_phash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      Multimodal.dHash56(Multimodal.synthGradientPngMedia(
          docs, "doc_id", "text", variantEvery = 7))
        .select(col("media_id"), col("width"), col("height"), col("phash"))
        .orderBy(col("media_id"))
    }),

    // extended: perceptual-hash near-dup pairs via banded hamming LSH
    // (4 × 14-bit bands; hamming ≤ 3 makes the band join EXACT by
    // pigeonhole). The planted twins surface at hamming ≤ 1; the oracle
    // mirrors the banded join, not brute force, so the same pairs (and
    // only those) must appear.
    "q_image_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      val hashed = Multimodal.dHash56(Multimodal.synthGradientPngMedia(
        docs, "doc_id", "text", variantEvery = 7))
      Multimodal.phashNearDup(hashed, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // extended: SCD-2 retention GC (the version store's VACUUM): drop
    // versions fully superseded at the watermark — a pure predicate, no
    // shuffle; partition-pruned file deletes on a valid_to-laid-out store.
    "q_version_gc" -> ((s, dir) => {
      val versions = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 250).as("vid"),
          (col("doc_id") * 1000).as("valid_from"))
      graft.index.VersionManager.gcVersions(
          graft.index.VersionManager.mergeVersions(versions, Seq("vid"),
            "valid_from", tieBreak = Seq("doc_id")),
          watermark = 400000L)
        .select(col("vid"), col("doc_id"), col("valid_from"), col("valid_to"))
        .orderBy(col("vid"), col("valid_from"))
    }),

    // extended: ordered first-touch funnel over the event log — each level
    // is a per-user min aggregate strictly after the previous level's
    // time; every shuffle keys on user_id (ops.EventAnalytics).
    "q_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_type"),
        Tables.epochMicros(ev).as("ts_us"))
      graft.ops.EventAnalytics.funnel(base, "user_id", "ts_us",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("step_idx"))
    }),

    // extended: weekly cohort retention triangle — first-event-week
    // cohorts × active-week offsets, exact integer week buckets
    // (epoch-micros `div`, no calendar functions).
    "q_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.select(col("user_id"),
        Tables.epochMicros(ev).as("ts_us"))
      graft.ops.EventAnalytics.retentionCohorts(base, "user_id", "ts_us")
        .orderBy(col("cohort_week"), col("week_offset"))
    }))

  /** Shared dHash-replay prefix: documents → md5-derived gradient params →
    * base + variant rows → 8×8 sampled lumas → 56 comparison bits →
    * `ph(media_id, phash)` (and `pv` carrying width/height). */
  private val phashOracleCtes: String =
    """WITH m AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS id, doc_id, md5(text) AS h
      |  FROM documents WHERE text IS NOT NULL),
      |prm AS (
      |  SELECT id, doc_id,
      |    16 + CAST(('0x'||substr(h,1,2)) AS INT) % 9 AS w,
      |    12 + CAST(('0x'||substr(h,3,2)) AS INT) % 7 AS ht,
      |    CAST(('0x'||substr(h,5,2)) AS INT) AS a,
      |    1 + CAST(('0x'||substr(h,7,2)) AS INT) % 7 AS b,
      |    1 + CAST(('0x'||substr(h,9,2)) AS INT) % 7 AS c,
      |    1 + CAST(('0x'||substr(h,11,2)) AS INT) % 13 AS e
      |  FROM m),
      |pv AS (
      |  SELECT id AS media_id, w, ht, a, b, c, e, FALSE AS variant FROM prm
      |  UNION ALL
      |  SELECT id||'_v', w, ht, a, b, c, e, TRUE FROM prm
      |  WHERE doc_id % 7 = 0),
      |lum AS (
      |  SELECT media_id, i, j,
      |    CASE WHEN variant AND x = w//16 AND y = ht//16
      |      THEN ((a + b*x + c*y + 7*x*x + 11*y*y + e*x*y) % 256 + 128) % 256
      |      ELSE (a + b*x + c*y + 7*x*x + 11*y*y + e*x*y) % 256 END AS l
      |  FROM (
      |    SELECT media_id, w, ht, a, b, c, e, variant,
      |      CAST(gi.i AS INT) AS i, CAST(gj.j AS INT) AS j,
      |      ((2*CAST(gi.i AS INT)+1)*w)//16 AS x,
      |      ((2*CAST(gj.j AS INT)+1)*ht)//16 AS y
      |    FROM pv CROSS JOIN UNNEST(range(8)) gi(i)
      |            CROSS JOIN UNNEST(range(8)) gj(j))),
      |ph AS (
      |  SELECT l1.media_id,
      |    coalesce(bit_or(CASE WHEN l1.l > l2.l
      |      THEN CAST(1 AS BIGINT) << (55 - (l1.j*7 + l1.i)) END),
      |      CAST(0 AS BIGINT)) AS phash
      |  FROM lum l1 JOIN lum l2
      |    ON l2.media_id = l1.media_id AND l2.j = l1.j AND l2.i = l1.i + 1
      |  WHERE l1.i < 7
      |  GROUP BY l1.media_id)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    // compaction-plan replay: the bin assignment IS one window — running
    // total of bytes BEFORE each file in (bytes desc, path) order, floored
    // by the target. BIGINT casts on the floor (DuckDB floor → DOUBLE).
    "q_compaction_plan" ->
      """SELECT doc_id, n_chars AS bytes,
        |  CAST(floor(COALESCE(SUM(n_chars) OVER (
        |    ORDER BY n_chars DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 50000.0) AS BIGINT) AS bin
        |FROM documents
        |ORDER BY bin, doc_id""".stripMargin,

    // as-of replay: latest view ts per purchase via a correlated backward
    // max, then the value re-attached on the (user, ts) key — row-identical
    // to the window-union formulation (right side is (user, ts)-unique)
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |  FROM events),
        |p AS (SELECT event_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts_us, max(value) AS vvalue FROM ev
        |      WHERE event_type = 'view' GROUP BY 1, 2),
        |m AS (SELECT p.event_id, p.user_id, p.ts_us,
        |  (SELECT max(v2.ts_us) FROM v v2
        |   WHERE v2.user_id = p.user_id AND v2.ts_us <= p.ts_us) AS view_ts
        |  FROM p)
        |SELECT m.event_id, m.user_id, m.ts_us, m.view_ts,
        |  v.vvalue AS view_value
        |FROM m LEFT JOIN v ON v.user_id = m.user_id AND v.ts_us = m.view_ts
        |ORDER BY m.event_id""".stripMargin,

    // the bin bucketing is invisible to semantics: the oracle is the plain
    // keyed range-predicate join the operator must equal exactly
    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id, ts_us FROM ev
        |      WHERE event_type = 'click'),
        |w AS (SELECT event_id AS purchase_id, user_id, ts_us AS w_start,
        |        ts_us + 21600000000 AS w_end FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT c.click_id, w.purchase_id, c.user_id, c.ts_us, w.w_start
        |FROM c JOIN w ON c.user_id = w.user_id
        |  AND c.ts_us >= w.w_start AND c.ts_us < w.w_end
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |marked AS (
        |  SELECT *, lag(ts_us) OVER w AS prev_ts,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |numbered AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq, min(ts_us) AS session_start,
        |  max(ts_us) AS session_end, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM numbered GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // forward-fill replay: the same running last_value(IGNORE NULLS)
    // window; the carried value passes through untouched (no arithmetic,
    // bit-identical doubles).
    "q_forward_fill" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM events ORDER BY event_id""".stripMargin,

    // windowed-funnel replay: the q_funnel CTE chain with the conversion
    // window bound on each level join.
    "q_funnel_windowed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |l1 AS (
        |  SELECT user_id, min(ts_us) AS t FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |l2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM ev e JOIN l1 ON e.user_id = l1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > l1.t
        |    AND e.ts_us <= l1.t + 259200000000
        |  GROUP BY e.user_id),
        |l3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM ev e JOIN l2 ON e.user_id = l2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > l2.t
        |    AND e.ts_us <= l2.t + 259200000000
        |  GROUP BY e.user_id)
        |SELECT CAST(0 AS INT) AS step_idx, 'view' AS step,
        |  (SELECT count(*) FROM l1) AS users
        |UNION ALL
        |SELECT CAST(1 AS INT), 'click', (SELECT count(*) FROM l2)
        |UNION ALL
        |SELECT CAST(2 AS INT), 'purchase', (SELECT count(*) FROM l3)
        |ORDER BY step_idx""".stripMargin,

    // outlier replay: exact per-type quartiles, the same Tukey-fence
    // expression tree, strict comparisons on identical doubles.
    "q_value_outliers" ->
      """WITH q AS (
        |  SELECT event_type AS type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type)
        |SELECT event_id AS id, event_type AS type, value,
        |  CASE WHEN value < q1 - 1.5*(q3-q1) THEN 'low' ELSE 'high' END
        |    AS side
        |FROM events e JOIN q ON e.event_type = q.type
        |WHERE value < q1 - 1.5*(q3-q1) OR value > q3 + 1.5*(q3-q1)
        |ORDER BY id""".stripMargin,

    // transition replay: the same user-keyed lead window, pair counts,
    // per-from normalizer as a grouped CTE (≡ the engine's window over
    // the tiny counts frame), exact-integer probability micro-units.
    "q_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |nx AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS to_type
        |  FROM ev),
        |p AS (SELECT from_type, to_type, count(*) AS n FROM nx
        |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |      FROM p GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n, f.n_from,
        |  CAST(round(CAST(1000000.0 AS DOUBLE) * CAST(p.n AS DOUBLE)
        |    / CAST(f.n_from AS DOUBLE), 0) AS BIGINT) AS p_micro
        |FROM p JOIN f USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // rate-anomaly replay: per-(type, hour) counts, trailing BIGINT window
    // sums (DuckDB's HUGEINT sums cast down before the double ops), the
    // same ((1e6·(x−μ))/σ) expression tree.
    "q_rate_anomaly" ->
      """WITH ev AS (
        |  SELECT event_type AS type,
        |    epoch_us(ts) // 3600000000 AS bucket FROM events),
        |c AS (SELECT type, bucket, count(*) AS n_events
        |      FROM ev GROUP BY type, bucket),
        |sw AS (
        |  SELECT type, bucket, n_events,
        |    count(n_events) OVER w AS n_prev,
        |    CAST(sum(n_events) OVER w AS BIGINT) AS s,
        |    CAST(sum(n_events*n_events) OVER w AS BIGINT) AS s2
        |  FROM c WINDOW w AS (PARTITION BY type ORDER BY bucket
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT type, bucket, n_events, n_prev,
        |  CASE WHEN n_prev*s2 - s*s > 0 THEN
        |    CAST(round(1000000.0
        |      * (CAST(n_events AS DOUBLE)
        |         - CAST(s AS DOUBLE) / CAST(n_prev AS DOUBLE))
        |      / sqrt(CAST(n_prev*s2 - s*s AS DOUBLE)
        |             / (CAST(n_prev AS DOUBLE) * CAST(n_prev AS DOUBLE))),
        |      0) AS BIGINT)
        |  END AS z_micro
        |FROM sw WHERE n_prev >= 5 ORDER BY type, bucket""".stripMargin,

    // interval-join replay: the same session CTEs, then the plain
    // closed-interval overlap join (the bin dedup is engine-side
    // mechanics; the result contract is exactly this nested predicate).
    "q_interval_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |marked AS (
        |  SELECT *, lag(ts_us) OVER w AS prev_ts,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |numbered AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, session_seq, min(ts_us) AS session_start,
        |    max(ts_us) AS session_end
        |  FROM numbered GROUP BY user_id, session_seq),
        |a AS (SELECT user_id AS a_user_id, session_seq AS a_session_seq,
        |        session_start AS s1, session_end AS e1
        |      FROM sess WHERE user_id % 100 = 0),
        |b AS (SELECT user_id AS b_user_id, session_seq AS b_session_seq,
        |        session_start AS s2, session_end AS e2
        |      FROM sess WHERE user_id % 100 <> 0)
        |SELECT a_user_id, a_session_seq, b_user_id, b_session_seq,
        |  least(e1, e2) - greatest(s1, s2) AS overlap_us
        |FROM a JOIN b ON s1 <= e2 AND s2 <= e1
        |ORDER BY a_user_id, a_session_seq, b_user_id, b_session_seq""".stripMargin,

    // occupancy replay: the same session CTEs, then each session unnested
    // into the hour buckets its integer-divided endpoints span.
    "q_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |marked AS (
        |  SELECT *, lag(ts_us) OVER w AS prev_ts,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |numbered AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, session_seq, min(ts_us) AS session_start,
        |    max(ts_us) AS session_end
        |  FROM numbered GROUP BY user_id, session_seq),
        |b AS (
        |  SELECT unnest(generate_series(session_start // 3600000000,
        |    session_end // 3600000000)) AS bucket FROM sess)
        |SELECT bucket, bucket * 3600000000 AS bucket_start_us,
        |  count(*) AS active
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_version_merge" ->
      """SELECT doc_id % 250 AS vid, doc_id, doc_id * 1000 AS valid_from,
        |  coalesce(lead(doc_id * 1000) OVER (PARTITION BY doc_id % 250
        |    ORDER BY doc_id * 1000, doc_id), 32503680000000) AS valid_to
        |FROM documents
        |ORDER BY vid, valid_from""".stripMargin,

    // arg_max skips NULL ordering keys exactly like Spark max_by, so the
    // two CASE-gated slots resolve each snapshot's active version.
    "q_version_diff" ->
      """WITH v AS (
        |  SELECT doc_id % 250 AS vid,
        |    (doc_id // 250) * 300000 + (doc_id % 250) * 1000 AS vf,
        |    doc_id AS payload,
        |    ((doc_id // 250) = 1 AND (doc_id % 250) % 7 = 0) AS del
        |  FROM documents),
        |a AS (
        |  SELECT vid,
        |    arg_max(struct_pack(payload := payload, del := del),
        |      CASE WHEN vf <= 125000 THEN vf END) AS s1,
        |    arg_max(struct_pack(payload := payload, del := del),
        |      CASE WHEN vf <= 450000 THEN vf END) AS s2
        |  FROM v GROUP BY vid),
        |c AS (
        |  SELECT vid,
        |    (s1 IS NOT NULL AND NOT s1.del) AS live1,
        |    (s2 IS NOT NULL AND NOT s2.del) AS live2,
        |    s1.payload AS p1, s2.payload AS p2
        |  FROM a)
        |SELECT vid,
        |  CASE WHEN NOT live1 AND live2 THEN 'added'
        |       WHEN live1 AND NOT live2 THEN 'removed'
        |       WHEN live1 AND live2 AND p1 IS DISTINCT FROM p2
        |            THEN 'changed' END AS change,
        |  CASE WHEN live1 THEN p1 END AS old_payload,
        |  CASE WHEN live2 THEN p2 END AS new_payload
        |FROM c
        |WHERE (NOT live1 AND live2) OR (live1 AND NOT live2)
        |   OR (live1 AND live2 AND p1 IS DISTINCT FROM p2)
        |ORDER BY vid""".stripMargin,

    "q_column_profile" ->
      """SELECT 'doc_id' AS col_name, count(doc_id) AS n_nonnull,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_s,
        |  CAST(max(doc_id) AS VARCHAR) AS max_s FROM documents
        |UNION ALL
        |SELECT 'lang', count(lang), count(DISTINCT lang),
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(n_chars), count(DISTINCT n_chars),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(source), count(DISTINCT source),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |FROM documents
        |ORDER BY col_name""".stripMargin,

    "q_version_latest" ->
      """SELECT o_custkey, o_orderkey, valid_from FROM (
        |  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS valid_from,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY epoch_ms(o_orderdate) DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_delete_cascade" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey = p_partkey
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_nationkey = 0))
        |ORDER BY p_partkey""".stripMargin,

    "q_checkpoint_filter" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |  AND o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "q_multitenant_scope" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total_bal
        |FROM customer WHERE c_nationkey = 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_varlength_hop01" ->
      """WITH withprev AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
        |    lag(l_linenumber) OVER w AS prev_ln,
        |    lag(l_partkey) OVER w AS prev_pk,
        |    lag(l_extendedprice) OVER w AS prev_price
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_extendedprice)),
        |seeds AS (
        |  SELECT * FROM withprev WHERE l_orderkey IN
        |    (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0))
        |SELECT DISTINCT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice FROM seeds
        |  UNION ALL
        |  SELECT l_orderkey, prev_ln, prev_pk, prev_price FROM seeds WHERE prev_ln IS NOT NULL)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin,

    "q_varlength_paths" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |co AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM li x JOIN li y USING (l_orderkey) WHERE x.l_partkey <> y.l_partkey),
        |starts AS (SELECT DISTINCT l_partkey AS a FROM li WHERE l_orderkey = 1),
        |ends AS (SELECT DISTINCT l_partkey AS b FROM li WHERE l_orderkey = 2),
        |e1 AS (SELECT co.* FROM co JOIN starts USING (a)),
        |p1 AS (SELECT a, NULL::BIGINT AS m, b FROM e1 JOIN ends USING (b)),
        |p2 AS (
        |  SELECT e1.a, e1.b AS m, co2.b
        |  FROM e1 JOIN co co2 ON co2.a = e1.b JOIN ends ON ends.b = co2.b
        |  WHERE e1.a <> e1.b AND e1.b <> co2.b)
        |SELECT DISTINCT part_node FROM (
        |  SELECT unnest([a, b]) AS part_node FROM p1
        |  UNION ALL SELECT unnest([a, m, b]) FROM p2)
        |ORDER BY part_node""".stripMargin,

    "q_multimodal_stub" ->
      """SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CAST(('0x'||substr(md5(text), 1, 2)) AS INT)/255.0*2.0-1.0 AS FLOAT) AS f0,
        |  CAST(CAST(('0x'||substr(md5(text), 11, 2)) AS INT)/255.0*2.0-1.0 AS FLOAT) AS f7,
        |  CAST(CAST(('0x'||substr(md5(text), 27, 2)) AS INT)/255.0*2.0-1.0 AS FLOAT) AS f15
        |FROM documents ORDER BY doc_id""".stripMargin,

    // analytic replay of the checkerboard PNG corpus: same md5-hex byte
    // derivation as Multimodal.synthPngMedia, means in closed form
    // (ce = count of (x+y)-even pixels = (w*h + (w%2)*(h%2)) / 2)
    // dHash replay: md5-hex → gradient params → the 8×8 NN sample grid →
    // adjacent-pair bits OR'd into the 56-bit BIGINT; variants flip the
    // (i=0, j=0) sample cell like the planted pixel.
    "q_image_phash" -> (phashOracleCtes +
      """SELECT pv.media_id, CAST(pv.w AS INT) AS width,
        |  CAST(pv.ht AS INT) AS height, ph.phash
        |FROM pv JOIN ph ON ph.media_id = pv.media_id
        |ORDER BY pv.media_id""".stripMargin),

    // near-dup replay: the same banded join — 4 × 14-bit band keys,
    // pair-once ids, bit_count(xor) verification.
    "q_image_neardup" -> (phashOracleCtes +
      """, bands AS (
        |  SELECT media_id, phash, CAST(k.k AS INT) AS k,
        |    (phash >> (14*CAST(k.k AS INT))) & 16383 AS v
        |  FROM ph CROSS JOIN UNNEST(range(4)) k(k))
        |SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
        |  CAST(bit_count(xor(l.phash, r.phash)) AS INT) AS hamming
        |FROM bands l JOIN bands r
        |  ON l.k = r.k AND l.v = r.v AND l.media_id < r.media_id
        |WHERE bit_count(xor(l.phash, r.phash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin),

    "q_multimodal_decode" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    4 + CAST(('0x'||substr(h,1,2)) AS INT) % 13 AS w,
        |    3 + CAST(('0x'||substr(h,3,2)) AS INT) % 7 AS ht,
        |    CAST(('0x'||substr(h,5,2)) AS INT) AS r1,
        |    CAST(('0x'||substr(h,7,2)) AS INT) AS g1,
        |    CAST(('0x'||substr(h,9,2)) AS INT) AS b1,
        |    CAST(('0x'||substr(h,11,2)) AS INT) AS r2,
        |    CAST(('0x'||substr(h,13,2)) AS INT) AS g2,
        |    CAST(('0x'||substr(h,15,2)) AS INT) AS b2
        |  FROM m),
        |c AS (SELECT *, w*ht AS npx, (w*ht + (w%2)*(ht%2))//2 AS ce FROM p),
        |f AS (
        |  SELECT doc_id, w, ht,
        |    CAST(ce*r1 + (npx-ce)*r2 AS DOUBLE)/npx AS mr,
        |    CAST(ce*g1 + (npx-ce)*g2 AS DOUBLE)/npx AS mg,
        |    CAST(ce*b1 + (npx-ce)*b2 AS DOUBLE)/npx AS mb
        |  FROM c)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id, CAST(w AS INT) AS width,
        |  CAST(ht AS INT) AS height, CAST(3 AS INT) AS channels,
        |  round(mr, 6) AS mean_r, round(mg, 6) AS mean_g,
        |  round(mb, 6) AS mean_b,
        |  round(0.299*mr + 0.587*mg + 0.114*mb, 6) AS mean_luma
        |FROM f ORDER BY doc_id""".stripMargin,

    // analytic replay of the PCM16 WAV corpus: same md5-hex byte derivation
    // as Multimodal.synthWavMedia — sample[i] = signed(digest[1+(i%15)])*256,
    // n = 64 + digest[0]%192 — so sums reduce to full-cycle × cycle-sum +
    // remainder-slice integer math (exact in BIGINT; one double division /
    // sqrt at the end, like the decoder)
    "q_audio_decode" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    64 + CAST(('0x'||substr(h,1,2)) AS INT) % 192 AS n,
        |    list_transform(generate_series(0,14), j ->
        |      (CASE WHEN CAST(('0x'||substr(h,2*j+3,2)) AS INT) < 128
        |            THEN CAST(('0x'||substr(h,2*j+3,2)) AS INT)
        |            ELSE CAST(('0x'||substr(h,2*j+3,2)) AS INT) - 256 END)
        |        * 256) AS s
        |  FROM m),
        |c AS (
        |  SELECT doc_id, n, s, n // 15 AS fullc, n % 15 AS rem,
        |    CAST(list_sum(s) AS BIGINT) AS cyc_sum,
        |    CAST(list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x))
        |      AS BIGINT) AS cyc_sq
        |  FROM p),
        |f AS (
        |  SELECT doc_id, n,
        |    fullc * cyc_sum
        |      + COALESCE(CAST(list_sum(list_slice(s, 1, rem)) AS BIGINT), 0)
        |      AS tot_sum,
        |    fullc * cyc_sq
        |      + COALESCE(CAST(list_sum(list_transform(list_slice(s, 1, rem),
        |          x -> CAST(x AS BIGINT) * x)) AS BIGINT), 0) AS tot_sq,
        |    list_max(list_transform(s, x -> abs(x))) AS peak
        |  FROM c)
        |SELECT CAST(doc_id AS VARCHAR) AS media_id,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  round(CAST(tot_sum AS DOUBLE) / n, 6) AS mean_amp,
        |  round(sqrt(CAST(tot_sq AS DOUBLE) / n), 6) AS rms,
        |  CAST(peak AS INT) AS peak
        |FROM f ORDER BY doc_id""".stripMargin,

    // GC replay: the merge window + the watermark predicate.
    "q_version_gc" ->
      """SELECT doc_id % 250 AS vid, doc_id, doc_id * 1000 AS valid_from,
        |  coalesce(lead(doc_id * 1000) OVER (PARTITION BY doc_id % 250
        |    ORDER BY doc_id * 1000, doc_id), 32503680000000) AS valid_to
        |FROM documents
        |QUALIFY valid_to > 400000
        |ORDER BY vid, valid_from""".stripMargin,

    // funnel replay: per-user strictly-after min chain, one count per
    // level. Spark's lit(i) is INT32 — CAST the step_idx literals.
    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |l1 AS (
        |  SELECT user_id, min(ts_us) AS t FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |l2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM ev e JOIN l1 ON e.user_id = l1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > l1.t
        |  GROUP BY e.user_id),
        |l3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM ev e JOIN l2 ON e.user_id = l2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > l2.t
        |  GROUP BY e.user_id)
        |SELECT CAST(0 AS INT) AS step_idx, 'view' AS step,
        |  (SELECT count(*) FROM l1) AS users
        |UNION ALL
        |SELECT CAST(1 AS INT), 'click', (SELECT count(*) FROM l2)
        |UNION ALL
        |SELECT CAST(2 AS INT), 'purchase', (SELECT count(*) FROM l3)
        |ORDER BY step_idx""".stripMargin,

    // retention replay: integer week buckets (`//` floor-div == Spark
    // `div` on non-negative epochs), distinct user-weeks, cohort join.
    "q_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
        |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
        |  count(*) AS users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin)
}
