package graft

import org.apache.spark.sql.functions._
import graft.index.VersionManager
import graft.ops.{Fusion, Profiling}

/** snapshotDiff / columnProfile / rrf unit behavior (the oracle gates
  * cover their full-query replay; these pin the edge semantics). */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops the rest") {
    // vid 1: changed; vid 2: unchanged; vid 3: added; vid 4: removed
    // (tombstone); vid 5: created+deleted inside the window (absent);
    // vid 6: deleted before t1, re-added before t2 (added).
    val versions = Seq(
      (1L, 10L, 100L, false), (1L, 11L, 200L, false),
      (2L, 20L, 100L, false),
      (3L, 30L, 200L, false),
      (4L, 40L, 100L, false), (4L, 40L, 200L, true),
      (5L, 50L, 160L, false), (5L, 50L, 180L, true),
      (6L, 60L, 50L, false), (6L, 60L, 80L, true), (6L, 61L, 200L, false)
    ).toDF("vid", "payload", "valid_from", "is_del")
    val out = VersionManager.snapshotDiff(versions, Seq("vid"), "valid_from",
      "payload", t1 = 150L, t2 = 250L, tombstoneCol = Some("is_del"))
      .orderBy("vid")
      .as[(Long, String, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, "changed", Some(10L), Some(11L)),
      (3L, "added", None, Some(30L)),
      (4L, "removed", Some(40L), None),
      (6L, "added", None, Some(61L))))
  }

  test("snapshotDiff is null-safe: NULL payload transitions are changes, " +
    "NULL tombstones read as live") {
    // vid 1: payload NULL -> 'x' (changed); vid 2: 'x' -> NULL (changed);
    // vid 3: NULL tombstone on the t2 version must mean live (changed),
    // not vanish from every class
    val versions = Seq(
      (1L, None, 100L, Some(false)), (1L, Some("x"), 200L, Some(false)),
      (2L, Some("x"), 100L, Some(false)), (2L, None, 200L, Some(false)),
      (3L, Some("a"), 100L, Some(false)), (3L, Some("b"), 200L, None)
    ).toDF("vid", "payload", "valid_from", "is_del")
    val out = VersionManager.snapshotDiff(versions, Seq("vid"),
      "valid_from", "payload", t1 = 150L, t2 = 250L,
      tombstoneCol = Some("is_del"))
      .orderBy("vid")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, "changed", None, Some("x")),
      (2L, "changed", Some("x"), None),
      (3L, "changed", Some("a"), Some("b"))))
  }

  test("columnProfile counts nulls/distincts; approx tracks exact") {
    val df = (0 until 10000)
      .map(i => (i.toLong, if (i % 10 == 0) null else s"v${i % 97}"))
      .toDF("id", "s")
    val exact = Profiling.columnProfile(df, Seq("id", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(exact("id") == ("id", 10000L, 10000L, "0", "9999"))
    assert(exact("s")._2 == 9000L && exact("s")._3 == 97L)
    assert(exact("s")._4 == "v0" && exact("s")._5 == "v96")
    val approx = Profiling.columnProfile(df, Seq("id", "s"), exact = false)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(approx("id") - 10000L) <= 500L) // HLL ~2% default error
    assert(math.abs(approx("s") - 97L) <= 10L)
  }

  test("distributionDrift computes add-one-smoothed PSI terms per key") {
    val a = Seq("x", "x", "x", "y").toDF("k")        // x:3 y:1, total 4
    val b = Seq("x", "y", "y", "z").toDF("k")        // x:1 y:2 z:1, total 4
    val out = Profiling.distributionDrift(a, b, "k")
      .orderBy("key").as[(String, Long, Long, Long)].collect()
    // union keys {x,y,z} → k=3, smoothed denominators 4+3=7 both sides
    def psi(na: Long, nb: Long): Long = {
      val pa = (na + 1).toDouble / 7.0; val pb = (nb + 1).toDouble / 7.0
      math.round(1000000.0 * (pa - pb) * math.log(pa / pb))
    }
    assert(out.toSeq === Seq(
      ("x", 3L, 1L, psi(3, 1)),
      ("y", 1L, 2L, psi(1, 2)),
      ("z", 0L, 1L, psi(0, 1))))
    // identical distributions → every term exactly 0
    val zero = Profiling.distributionDrift(a, a, "k")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.abs(col("psi_micro"))))
      .as[Long].head()
    assert(zero === 0L)
  }

  test("snapshotDiff matches a driver-side reference model on random " +
    "version histories") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val versions = (0 until 40).flatMap { vid =>
        val n = 1 + rnd.nextInt(4)
        val vfs = rnd.shuffle((1 to 40).toList).take(n)
        vfs.map { vf =>
          (vid.toLong,
            if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(5).toLong),
            vf.toLong * 10, rnd.nextInt(5) == 0)
        }
      }
      val (t1, t2) = { val a = (1 + rnd.nextInt(40)) * 10L
                       val b = (1 + rnd.nextInt(40)) * 10L
                       (math.min(a, b), math.max(a, b)) }
      val df = versions.toDF("vid", "payload", "valid_from", "is_del")
      val got = VersionManager.snapshotDiff(df, Seq("vid"), "valid_from",
        "payload", t1, t2, tombstoneCol = Some("is_del"))
        .as[(Long, String, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // reference model: latest version at-or-before t, per vid
      val expected = versions.groupBy(_._1).flatMap { case (vid, vs) =>
        def at(t: Long) = vs.filter(_._3 <= t)
          .sortBy(_._3).lastOption.map(v => (v._2, v._4))
        val (s1, s2) = (at(t1), at(t2))
        val live1 = s1.exists(!_._2); val live2 = s2.exists(!_._2)
        val p1 = s1.map(_._1); val p2 = s2.map(_._1)
        if (!live1 && live2) Some(vid -> (("added", None, p2.get)))
        else if (live1 && !live2) Some(vid -> (("removed", p1.get, None)))
        else if (live1 && live2 && p1.get != p2.get)
          Some(vid -> (("changed", p1.get, p2.get)))
        else None
      }
      assert(got == expected, s"trial $trial t1=$t1 t2=$t2")
    }
  }

  test("rrf fuses bounded lists with one-sided membership") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Fusion.rrf(Seq("a" -> a, "b" -> b), "id", "rank",
      rrfK = 60, k = 10)
      .as[(Long, Double, Option[Int], Option[Int])].collect().toSeq
    def r(x: Int) = 1.0 / (60 + x)
    assert(out.head == ((20L, r(2) + r(1), Some(2), Some(1))))
    assert(out.map(_._1) == Seq(20L, 10L, 40L, 30L))
    assert(out.map(_._2) == Seq(r(2) + r(1), r(1), r(2), r(3)))
  }

  test("rrf folds three lists, ids present in any subset of them") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((3L, 1)).toDF("id", "rank")
    val c = Seq((1L, 1), (3L, 2)).toDF("id", "rank")
    val out = Fusion.rrf(Seq("a" -> a, "b" -> b, "c" -> c), "id", "rank",
      rrfK = 60, k = 10)
      .as[(Long, Double, Option[Int], Option[Int], Option[Int])]
      .collect().toSeq
    def r(x: Int) = 1.0 / (60 + x)
    // 1: lists a+c; 3: lists b+c (absent from the FIRST list — the
    // coalesce over accumulated id slots must still align it); 2: a only
    assert(out == Seq(
      (1L, r(1) + r(1), Some(1), None, Some(1)),
      (3L, r(1) + r(2), None, Some(1), Some(2)),
      (2L, r(2), Some(2), None, None)))
  }

  test("gcVersions drops only versions invisible to any as-of >= watermark") {
    import graft.index.VersionManager
    // vid 1: versions at 10, 20, 30; vid 2: one live version at 5
    val v = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "x")).toDF("vid", "valid_from", "payload")
    val merged = VersionManager.mergeVersions(v, Seq("vid"), "valid_from")
    val gc = VersionManager.gcVersions(merged, watermark = 25L)
    val kept = gc.select("vid", "valid_from")
      .as[(Long, Long)].collect().toSet
    // v@10 has valid_to=20 <= 25 -> gone; v@20 (valid_to 30 > 25) is the
    // version VISIBLE at the watermark and must survive; vid 2 is live
    assert(kept === Set((1L, 20L), (1L, 30L), (2L, 5L)))
    // as-of semantics preserved at and after the watermark
    val asOf25 = VersionManager.latestVersions(
      gc.filter(col("valid_from") <= 25L), Seq("vid"), "valid_from")
      .select("vid", "payload").as[(Long, String)].collect().toSet
    assert(asOf25 === Set((1L, "b"), (2L, "x")))
  }

  test("cooccurrenceStats computes exact pair doc-frequencies and PMI") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "cat dog"), (2L, "cat dog bird"), (3L, "cat fish"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrenceStats(docs, "text", "doc_id",
        vocabSize = 4)
      .orderBy("tok_a", "tok_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    def pmi(n: Long, ab: Long, a: Long, b: Long) =
      BigDecimal(math.log(n.toDouble * ab / (a.toDouble * b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      ("bird", "cat", 1L, 3L, 1L, pmi(3, 1, 1, 3)),
      ("bird", "dog", 1L, 2L, 1L, pmi(3, 1, 1, 2)),
      ("cat", "dog", 3L, 2L, 2L, pmi(3, 2, 3, 2)),
      ("cat", "fish", 3L, 1L, 1L, pmi(3, 1, 3, 1))))
  }
}
