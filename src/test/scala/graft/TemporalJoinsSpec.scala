package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L), (4L, "C", 10L))
    .toDF("trade_id", "sym", "ts")
  private lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 100L, 2.0), ("A", 210L, 3.0),
    ("B", 49L, 4.0), ("B", 51L, 5.0))
    .toDF("sym", "ts", "px")

  test("asofJoin backward: equal-ts match wins, later quotes invisible, " +
    "keyless rows stay null") {
    val out = TemporalJoins.asofJoin(trades, quotes, "sym", "ts", "ts")
      .select(col("trade_id"), col("_asof._ts").as("qts"),
        col("_asof.px").as("px"))
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(100L), Some(2.0)))) // equal ts matches
    assert(out(1) == ((2L, Some(100L), Some(2.0)))) // 210 is in the future
    assert(out(2) == ((3L, Some(49L), Some(4.0))))  // 51 > 50
    assert(out(3) == ((4L, None, None)))            // no C quotes
  }

  test("intervalJoin: multi-bin overlaps dedup to one row, closed ends") {
    val a = Seq((1L, 0L, 25L), (2L, 0L, 5L), (3L, 50L, 55L))
      .toDF("aid", "s", "e")
    val b = Seq((10L, 5L, 40L), (11L, 6L, 9L), (12L, 55L, 60L))
      .toDF("bid", "s", "e")
    val out = TemporalJoins.intervalJoin(a, b, "s", "e", None,
        binMicros = 10L)
      .select("a_aid", "b_bid", "overlap_us")
      .as[(Long, Long, Long)].collect().toSet
    // (1,10) shares bins {0,1,2} but must appear ONCE with overlap 20;
    // (1,11) nested interval, overlap 3; (2,10) and (3,12) touch at a
    // shared endpoint (closed semantics → 0-length overlap); (2,11)
    // shares bin 0 but does not overlap — the exact post-filter drops it
    assert(out === Set((1L, 10L, 20L), (1L, 11L, 3L), (2L, 10L, 0L),
      (3L, 12L, 0L)))
  }

  test("intervalJoin key-matched joins within the key only") {
    val a = Seq(("x", 0L, 10L)).toDF("k", "s", "e")
    val b = Seq(("x", 5L, 15L), ("y", 5L, 15L)).toDF("k", "s", "e")
    val out = TemporalJoins.intervalJoin(a, b, "s", "e", Some("k"), 10L)
    assert(out.count() === 1L)
    assert(out.select("b_k").as[String].head() === "x")
  }

  test("intervalJoin fails loudly past the span cap") {
    val a = Seq((1L, 0L, 1000L)).toDF("aid", "s", "e")
    val b = Seq((2L, 0L, 5L)).toDF("bid", "s", "e")
    val ex = intercept[Exception] {
      TemporalJoins.intervalJoin(a, b, "s", "e", None, 10L,
        maxSpanBins = 50).collect()
    }
    assert(ex.getMessage.contains("intervalJoin interval inverted") ||
      String.valueOf(ex.getCause).contains("intervalJoin interval inverted"))
  }

  test("asofJoin tolerance bounds the backward window") {
    val out = TemporalJoins.asofJoin(trades, quotes, "sym", "ts", "ts",
      toleranceMicros = Some(5L))
      .select(col("trade_id"), col("_asof._ts").as("qts"))
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0)._2.contains(100L)) // within 5
    assert(out(1)._2.isEmpty)        // 205-100 > 5
    assert(out(2)._2.contains(49L))  // 50-49 <= 5
  }

  test("asofJoin rejects non-integral timestamps") {
    val badL = trades.withColumn("ts", col("ts").cast("double"))
    val e = intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(badL, quotes, "sym", "ts", "ts"))
    assert(e.getMessage.contains("integral"))
  }

  test("rangeJoin equals the naive range-predicate join across bin " +
    "boundaries") {
    val pts = Seq((1L, "u", 5L), (2L, "u", 10L), (3L, "u", 19L),
      (4L, "v", 10L)).toDF("pid", "k", "t")
    val ivs = Seq((10L, "u", 3L, 12L), (11L, "u", 9L, 20L),
      (12L, "v", 11L, 15L)).toDF("iid", "k", "s", "e")
    // binMicros=4 forces every interval to span multiple bins
    val got = TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e",
      key = Some("k"), binMicros = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, pts("k") === ivs("k") &&
        pts("t") >= ivs("s") && pts("t") < ivs("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want &&
      got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("rangeJoin fails loudly on an interval exceeding the span cap") {
    val pts = Seq((1L, 5L)).toDF("pid", "t")
    val ivs = Seq((10L, 0L, 1000L)).toDF("iid", "s", "e")
    val out = TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e",
      key = None, binMicros = 2L, maxSpanBins = 10)
    val e = intercept[Exception](out.count())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("spanning"))
  }
}
