package graft

import graft.functions.WindowRollingHashes
import org.apache.spark.sql.functions._

/** [[WindowRollingHashes]] — the O(n) window-identity pass under the
  * span/suffix dedup exchanges: the slide must equal a from-scratch
  * recompute at every position, equal windows must collide, and
  * boundary-shifted token splits must not. */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(tokens: Seq[String], span: Int): Seq[Seq[Byte]] = {
    WindowRollingHashes.register(spark)
    Seq(Tuple1(tokens)).toDF("toks")
      .select(WindowRollingHashes.windowHashes(col("toks"), span).as("h"))
      .collect().head.getSeq[Array[Byte]](0).map(_.toSeq)
  }

  test("slide equals from-scratch: every window of a long array matches " +
    "the same window hashed standalone") {
    val rnd = new scala.util.Random(42)
    val toks = Seq.fill(80)(s"t${rnd.nextInt(12)}")
    val span = 7
    val all = hashesOf(toks, span)
    assert(all.size == toks.size - span + 1)
    // standalone: each window alone is its own position-0 hash
    toks.sliding(span).zipWithIndex.foreach { case (w, i) =>
      assert(hashesOf(w, span).head == all(i),
        s"slide diverged from direct recompute at window $i")
    }
  }

  test("equal windows collide; reordering, boundary shifts and " +
    "single-token edits do not") {
    val span = 3
    val a = hashesOf(Seq("x", "quick", "brown", "fox", "x2"), span)
    val b = hashesOf(Seq("y", "quick", "brown", "fox"), span)
    assert(a(1) == b(1)) // same window, different context/position
    assert(hashesOf(Seq("a", "b", "c"), span).head !=
      hashesOf(Seq("b", "a", "c"), span).head)   // order-sensitive
    assert(hashesOf(Seq("ab", "c", "d"), span).head !=
      hashesOf(Seq("a", "bc", "d"), span).head)  // boundary-sensitive
    assert(hashesOf(Seq("a", "b", "c"), span).head !=
      hashesOf(Seq("a", "b", "d"), span).head)
  }

  test("short arrays emit no windows; span-sized array emits exactly one") {
    assert(hashesOf(Seq("a", "b"), 3).isEmpty)
    assert(hashesOf(Seq("a", "b", "c"), 3).size == 1)
  }
}
