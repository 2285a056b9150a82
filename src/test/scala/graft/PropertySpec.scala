package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.filter.FilterAst
import graft.functions.{HashFunctions, MinhashSignature}
import graft.index.VersionManager

/** Property tests mirroring the reference's Hypothesis usage (SURVEY.md §5):
  * id/hash invariants, filter-compilation laws, SCD-2 interval invariants. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const("the"),
      Gen.const("naïve café"), Gen.const("…—…"), Gen.const("\t \n")))
      .map(_.mkString(" ")))

  test("compiled MinhashSignature == composed form on arbitrary strings") {
    MinhashSignature.register(spark)
    val samples = Gen.listOfN(60, textGen).sample.get.distinct
    val df = samples.toDF("text")
    val rows = df.select(
      MinhashSignature.signature(col("text"), 8, 3).as("native"),
      HashFunctions.minhashSignature(col("text"), 8, 3).as("composed"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.zip(samples).foreach { case ((n, c), s) =>
      assert(n == c, s"mismatch for input ${s.take(60).mkString}")
    }
  }

  test("minhash signature values stay within the affine field") {
    MinhashSignature.register(spark)
    val samples = Gen.listOfN(40, textGen).sample.get
    val sigs = samples.toDF("text")
      .select(MinhashSignature.signature(col("text"), 8, 3))
      .as[Seq[Long]].collect()
    sigs.foreach(sig =>
      sig.foreach(v => assert(v >= 0 && v < HashFunctions.MinhashPrime)))
  }

  test("filter compilation: De Morgan and double negation hold row-wise") {
    val df = (1 to 200).map(i => (i.toLong, s"name$i", i * 1.5))
      .toDF("id", "name", "score").cache()
    import FilterAst._
    val a: Filter = Pred("id", Gt, 50L)
    val b: Filter = Pred("name", TextMatch, "1")
    def rows(f: Filter): Set[Long] =
      df.filter(compile(f)).select("id").as[Long].collect().toSet
    assert(rows(Not(And.of(a, b))) == rows(Or.of(Not(a), Not(b))))
    assert(rows(Not(Or.of(a, b))) == rows(And.of(Not(a), Not(b))))
    assert(rows(Not(Not(a))) == rows(a))
  }

  test("SCD-2 intervals chain per key: valid_to = next valid_from, live = sentinel") {
    val versionsGen = Gen.listOfN(8,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 1000L)))
    (1 to 25).foreach { _ =>
      val vs = versionsGen.sample.getOrElse(Nil)
      if (vs.nonEmpty) {
        val df = vs.zipWithIndex
          .map { case ((k, t), i) => (s"k$k", t, f"p$i%03d") }
          .toDF("vid", "valid_from", "payload")
        val closed = VersionManager
          .mergeVersions(df, Seq("vid"), tieBreak = Seq("payload"))
          .select("vid", "valid_from", "payload", "valid_to")
          .as[(String, Long, String, Long)].collect()
          .groupBy(_._1)
        closed.foreach { case (_, rows) =>
          val sorted = rows.sortBy(r => (r._2, r._3))
          sorted.sliding(2).foreach {
            case Array((_, _, _, t1), (_, f2, _, _)) =>
              assert(t1 == f2, s"interval gap/overlap in ${sorted.mkString(",")}")
            case _ => ()
          }
          assert(sorted.last._4 == graft.model.Schemas.TimestampUpperBound)
        }
      }
    }
  }
}
