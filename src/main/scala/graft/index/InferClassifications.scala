package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.byokg.KGLinker
import graft.llm.LLM

/**
 * Domain-adaptive entity classification inference (reference
 * indexing/extract/infer_classifications.py:22-160): sample chunks, ask the
 * LLM for domain-specific entity classifications inside
 * `<entity_classifications>` tags, optionally iterate, then rank and keep the
 * top N. The resulting list seeds extraction — in this engine it becomes the
 * literal classification array [[LexicalGraphBuilder.fromDocuments]] hashes
 * entities into (the "broadcast into extraction": a bounded driver-side list
 * baked into the plan).
 */
object InferClassifications {

  /** reference indexing/constants.py DEFAULT_ENTITY_CLASSIFICATIONS. */
  val DefaultClassifications: Seq[String] = Seq(
    "Company", "Location", "Event", "Sports Team", "Person", "Role",
    "Product", "Service", "Creative Work", "Software", "Financial Instrument")

  val Tag = "entity_classifications"

  def buildPrompt(sampleChunks: Seq[String], existing: Seq[String]): String =
    s"""Analyze these chunks and propose domain entity classifications.
       |${sampleChunks.map(c => s"<chunk>$c</chunk>").mkString("\n")}
       |Existing classifications:
       |${existing.mkString("\n")}
       |Reply with one classification per line inside <$Tag></$Tag>.""".stripMargin

  def buildRankPrompt(classifications: Seq[String]): String =
    s"""Rank these entity classifications from most to least useful.
       |${classifications.mkString("\n")}
       |Reply with one classification per line inside <$Tag></$Tag>.""".stripMargin

  /** Parse `<entity_classifications>` lines (infer_classifications.py:79-93). */
  def parseClassifications(response: String): Seq[String] =
    KGLinker.parseTag(response, Tag)

  /** Sample → propose → rank → top N; falls back to `defaults` when the LLM
    * yields nothing (the reference's domain-adaptation-failed path). Sampling
    * is a deterministic md5-ordered rotation per iteration instead of
    * `random.sample`, so a rebuild infers the same classes. */
  def infer(chunks: DataFrame, textCol: String, llm: LLM,
            numSamples: Int = 5, iterations: Int = 1,
            numClassifications: Int = 15,
            defaults: Seq[String] = DefaultClassifications): Seq[String] = {
    val proposed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (i <- 1 to iterations) {
      val sample = chunks.select(col(textCol).cast("string").as("t"))
        .orderBy(md5(concat(col("t"), lit(i))))
        .limit(numSamples).collect().map(_.getString(0)).toSeq
      proposed ++= parseClassifications(
        llm.complete(buildPrompt(sample, defaults)))
    }
    if (proposed.isEmpty) defaults
    else {
      val titled = proposed.toSeq.map(c =>
        c.split(" ").map(_.capitalize).mkString(" "))
      val ranked = parseClassifications(llm.complete(buildRankPrompt(titled)))
        .take(numClassifications)
      if (ranked.isEmpty) defaults else ranked
    }
  }
}
