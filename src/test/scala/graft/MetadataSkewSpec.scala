package graft

import org.apache.spark.sql.functions._
import graft.filter.MetadataTypes
import graft.ops.Skew

class MetadataSkewSpec extends SparkSpec {
  import spark.implicits._

  test("typeNameForKeyValue infers int/float/timestamp/text") {
    val df = Seq(
      ("count", "42"), ("ratio", "3.14"), ("ratio2", "1e-3"),
      ("pub_date", "2024-01-15"), ("pub_date", "not a date"),
      ("title", "hello world"), ("neg", "-7"))
      .toDF("k", "v")
    val out = df.select(col("k"), col("v"),
      MetadataTypes.typeNameForKeyValue(col("k"), col("v")).as("t"))
      .as[(String, String, String)].collect().toSeq
    assert(out.contains(("count", "42", "int")))
    assert(out.contains(("ratio", "3.14", "float")))
    assert(out.contains(("ratio2", "1e-3", "float")))
    assert(out.contains(("pub_date", "2024-01-15", "timestamp")))
    assert(out.contains(("pub_date", "not a date", "text")))
    assert(out.contains(("title", "hello world", "text")))
    assert(out.contains(("neg", "-7", "int")))
  }

  test("datetime normalization to ISO-8601 across input shapes") {
    val out = Seq("2024-01-15", "01/15/2024", "2024/01/15",
      "2024-01-15 10:30:00", "garbage")
      .toDF("v").select(MetadataTypes.toIso8601(col("v"))).as[String].collect()
    assert(out(0) == "2024-01-15T00:00:00")
    assert(out(1) == "2024-01-15T00:00:00")
    assert(out(2) == "2024-01-15T00:00:00")
    assert(out(3) == "2024-01-15T10:30:00")
    assert(out(4) == null)
  }

  test("formatMetadata normalizes date-keyed map values, keeps the rest") {
    val out = Seq(Tuple1(Map(
      "published_date" -> "01/15/2024",
      "title" -> "Doc",
      "broken_date" -> "not a date")))
      .toDF("m").select(MetadataTypes.formatMetadata(col("m")))
      .as[Map[String, String]].head()
    assert(out("published_date") == "2024-01-15T00:00:00")
    assert(out("title") == "Doc")
    assert(out("broken_date") == "not a date") // unformattable -> original
  }

  test("isDateTimeKey follows the suffix convention") {
    assert(MetadataTypes.isDateTimeKey("published_date"))
    assert(MetadataTypes.isDateTimeKey("CREATED_DATETIME"))
    assert(!MetadataTypes.isDateTimeKey("date_of_birth_text"))
  }

  test("saltedJoin equals the plain join") {
    // skewed: key 1 dominates
    val big = ((1 to 500).map(_ => (1L, "x")) ++ Seq((2L, "y"), (3L, "z")))
      .toDF("k", "payload").repartition(8)
    val small = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4")).toDF("k", "dim")
    val salted = Skew.saltedJoin(big, small, "k", salt = 4)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    val plain = big.join(small, Seq("k"))
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(1L) == 500)
  }

  test("saltedCount equals plain groupBy count") {
    val df = ((1 to 300).map(i => ("hot", i)) ++ Seq(("cold", 0)))
      .toDF("k", "row_id").repartition(8)
    val out = Skew.saltedCount(df, "k", salt = 4)
      .as[(String, Long)].collect().toMap
    assert(out == Map("hot" -> 300L, "cold" -> 1L))
  }

  test("salting refuses a frame with no distinguishing column") {
    // key-only: every duplicate of the hot key hashes to ONE bucket, so
    // salting cannot relieve the skew — refuse loudly instead of silently
    // degrading to the unsalted shape.
    val keyOnly = Seq(Tuple1("hot"), Tuple1("cold")).toDF("k")
    val eKc = intercept[IllegalArgumentException] {
      Skew.saltedCount(keyOnly, "k", salt = 4)
    }
    assert(eKc.getMessage.contains("no non-map column besides key"))
    // key + map metadata only: maps are unhashable, so still degenerate
    val keyMap = Seq(("hot", Map("a" -> "1"))).toDF("k", "metadata")
    val eKm = intercept[IllegalArgumentException] {
      Skew.saltedJoin(keyMap, Seq(("hot", 1)).toDF("k", "d"), "k", salt = 4)
    }
    assert(eKm.getMessage.contains("no non-map column besides key"))
  }

  test("contentSalt skips map columns instead of throwing") {
    // this repo's metadata columns are MapType; xxhash64 rejects maps, so
    // the salt must hash only the hashable columns
    val withMap = Seq(
      ("k1", 1, Map("m" -> "x")), ("k1", 2, Map("m" -> "y")))
      .toDF("k", "row_id", "metadata")
    val salts = withMap.select(Skew.contentSalt(withMap, 8).as("s"))
      .as[Long].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    // and the full salted join works on a map-carrying big side
    val joined = Skew.saltedJoin(withMap,
      Seq(("k1", "dim")).toDF("k", "d"), "k", salt = 4)
    assert(joined.count() == 2)
  }

  test("content-hash salt is layout-independent and spreads distinct rows") {
    val base = (1L to 200L).map(i => (i % 5, s"p$i")).toDF("k", "payload")
    def assignments(parts: Int) = base.repartition(parts)
      .withColumn("_s", Skew.contentSalt(base, 4))
      .as[(Long, String, Long)].collect().toSet
    // same (row -> salt) mapping under 1, 8, and 13 partitions
    val one = assignments(1)
    assert(assignments(8) == one && assignments(13) == one)
    // the hot key's distinct rows actually scatter across buckets
    assert(one.filter(_._1 == 0L).map(_._3).size > 1)
  }
}
