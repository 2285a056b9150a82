package graft.index

import scala.collection.mutable

/**
 * Parser for the reference's delimited extraction format — the text a real
 * extraction LLM emits (`topic:` / `entities:` / `proposition:` blocks with
 * `value|classification` and `subject|predicate|object` lines), parsed into
 * the nested topic model
 * (reference: indexing/utils/topic_utils.py:15-184 parse_extracted_topics
 * and its format/clean helpers; prompt format indexing/prompts.py:57-174).
 *
 * This is the production seam the deterministic stub grammar stands in for:
 * swap [[graft.llm.StubLLM]] for a real model and
 * [[LexicalGraphBuilder.fromExtractions]] feeds the same nine tables.
 */
object TopicParser {

  val DefaultTopic = "context"
  val LocalEntityClassification: String = LexicalGraphBuilder.LocalEntityClass

  final case class ParsedEntity(value: String, classification: String)
  final case class ParsedFact(subject: ParsedEntity, predicate: String,
                              obj: Option[ParsedEntity],
                              complement: Option[ParsedEntity])
  final case class ParsedStatement(value: String, details: Seq[String],
                                   facts: Seq[ParsedFact])
  final case class ParsedTopic(value: String, entities: Seq[ParsedEntity],
                               statements: Seq[ParsedStatement])

  /** `format_value` (topic_utils.py:27-28): underscores → spaces. */
  def formatValue(s: String): String =
    if (s == null) "" else s.replace('_', ' ')

  /** Python str.title(): letters after a non-letter upper-cased, the rest
    * lowered (topic_utils.py:30-31 format_classification). */
  private def title(s: String): String = {
    val sb = new StringBuilder
    var prevLetter = false
    for (ch <- s) {
      sb.append(
        if (ch.isLetter && !prevLetter) ch.toUpper
        else if (ch.isLetter) ch.toLower
        else ch)
      prevLetter = ch.isLetter
    }
    sb.toString
  }

  def formatClassification(s: String): String =
    if (s == null || s.isEmpty) "" else title(formatValue(s))

  def stripFullStop(s: String): String =
    if (s != null && s.nonEmpty && s.endsWith(".")) s.dropRight(1) else s

  private def removeParenthetical(s: String): String =
    s.replaceAll("\\(.*\\)", "").replace("  ", " ").trim

  private val Articles = Seq("a ", "an ", "the ")

  private def removeArticles(s: String): String = {
    val lower = s.toLowerCase
    Articles.find(lower.startsWith)
      .map(a => s.substring(a.length)).getOrElse(s)
  }

  /** `clean` (topic_utils.py:24-25): the entity-map key normalization. */
  def clean(s: String): String =
    removeArticles(removeParenthetical(formatValue(s)))

  /** The line after the first ':', all further colons dropped — the
    * reference's `''.join(line.split(':')[1:]).strip()`. */
  private def afterColon(line: String): String =
    line.split(":", -1).drop(1).mkString("").trim

  /** Full state-machine parse; returns (topics, garbage lines). Faithful to
    * parse_extracted_topics including: first-seen entity keying by cleaned
    * value, facts resolving subject/object against the current topic's
    * entity map with local-entity fallbacks, unresolved-subject facts also
    * recorded as details, and empty topics/statements dropped. */
  def parseExtractedTopics(rawText: String): (Seq[ParsedTopic], Seq[String]) = {
    val garbage = mutable.ListBuffer.empty[String]
    val topics = mutable.ListBuffer.empty[ParsedTopic]

    var currentState: Option[String] = None
    var topicValue = DefaultTopic
    val entities = mutable.LinkedHashMap.empty[String, ParsedEntity]
    val statements = mutable.ListBuffer.empty[ParsedStatement]
    var stmtValue: Option[String] = None
    val stmtDetails = mutable.ListBuffer.empty[String]
    val stmtFacts = mutable.ListBuffer.empty[ParsedFact]

    def flushStatement(): Unit = {
      if (stmtValue.isDefined && (stmtDetails.nonEmpty || stmtFacts.nonEmpty))
        statements += ParsedStatement(stmtValue.get, stmtDetails.toList,
          stmtFacts.toList)
      stmtValue = None; stmtDetails.clear(); stmtFacts.clear()
    }

    def flushTopic(): Unit = {
      flushStatement()
      if (entities.nonEmpty || statements.nonEmpty)
        topics += ParsedTopic(topicValue, entities.values.toList,
          statements.toList)
      entities.clear(); statements.clear()
    }

    // only exactly-empty lines skip pre-trim (reference `if not line`);
    // whitespace-only lines fall through the state machine like any other
    for (raw <- rawText.split("\n", -1) if raw.nonEmpty; line = raw.trim) {
      if (line.startsWith("topic:")) {
        flushTopic()
        currentState = None
        topicValue = stripFullStop(formatValue(afterColon(line)))
      } else if (line.startsWith("proposition:")) {
        flushStatement()
        stmtValue = Some(formatValue(afterColon(line)))
        currentState = Some("relationship-extraction")
      } else if (line.startsWith("entities:")) {
        currentState = Some("entity-extraction")
      } else if (line.startsWith("entity-") && line.endsWith("s:")) {
        currentState = Some("relationship-extraction")
      } else currentState match {
        case Some("entity-extraction") =>
          val parts = line.split("\\|", -1)
          if (parts.length == 2) {
            val key = clean(parts(0))
            if (!entities.contains(key))
              entities(key) =
                ParsedEntity(key, formatClassification(parts(1)))
          } else garbage += s"UNPARSEABLE ENTITY: $line"
        case Some("relationship-extraction") =>
          val parts = line.split("\\|", -1)
          var fact: Option[ParsedFact] = None
          if (parts.length == 3 && parts.forall(_.nonEmpty)) {
            val Array(s, p, o) = parts
            val sEnt = entities.get(clean(s))
            val oEnt = entities.get(clean(o))
            fact = (sEnt, oEnt) match {
              case (Some(se), Some(oe)) =>
                Some(ParsedFact(se, formatValue(p), Some(oe), None))
              case (Some(se), None) =>
                Some(ParsedFact(se, formatValue(p), None, Some(
                  ParsedEntity(formatValue(o), LocalEntityClassification))))
              case _ =>
                // unresolved subject: local-entity fact AND a details line
                stmtDetails += parts.map(formatValue).mkString(" ")
                Some(ParsedFact(
                  ParsedEntity(formatValue(s), LocalEntityClassification),
                  formatValue(p),
                  None,
                  Some(ParsedEntity(formatValue(o), LocalEntityClassification))))
            }
            fact.foreach(stmtFacts += _)
          }
          if (fact.isEmpty) {
            val details =
              if (stmtValue.isDefined) parts.map(formatValue).mkString(" ")
              else ""
            if (details.nonEmpty) stmtDetails += details
            else garbage += s"UNPARSEABLE STATEMENT: $line"
          }
        case _ => garbage += s"UNPARSEABLE: $line"
      }
    }
    flushTopic()
    (topics.toList, garbage.toList)
  }
}
