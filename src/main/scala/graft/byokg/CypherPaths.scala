package graft.byokg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The path-collect pipeline — the reference's multiple-entity graph
  * search (entity_based_search.py:150-159):
  *
  * {{{
  * MATCH p=(e1:E {id: $startId})-[:RELATION*1..2]-(e2:E)
  * WHERE e2.id in $endIds
  * UNWIND nodes(p) AS n
  * WITH DISTINCT COLLECT(n) AS entities
  * MATCH (s)-[:SUBJECT]->(f)<-[:OBJECT]-(o),
  *       (f)-[:SUPPORTS]->()-[:PREVIOUS*0..1]-(l)
  * WHERE s in entities and o in entities
  * RETURN DISTINCT l.id AS l LIMIT 50
  * }}}
  *
  * Grammar: a `p=` path binding over ONE chain (var-length hops
  * included), `UNWIND nodes(p) AS n`, one collecting WITH
  * (`WITH DISTINCT COLLECT(n) AS xs` or `WITH COLLECT(DISTINCT n) AS
  * xs` — equivalent here: the collected set feeds membership, where
  * duplicates are unobservable), then a full second MATCH query whose
  * WHERE may test `v in xs` / `NOT v in xs` membership. Everything else
  * refuses loudly with the supported shape in the message.
  *
  * Compilation is Spark-first and never materializes the path list on
  * the driver:
  *  1. the bound chain expands per var-length combination into
  *     fixed-length chains with explicit intermediate variables, each
  *     re-entering [[CypherLite.parse]]/[[CypherLite.compile]] verbatim
  *     (the head WHERE — including a large `$endIds` IN list and its
  *     broadcast-semi hoist — rides along unchanged);
  *  2. `nodes(p)` ∘ COLLECT is the distinct union of every variable
  *     column of every variant — one narrow union + one distinct, no
  *     driver collect;
  *  3. each membership term compiles as a BROADCAST LEFT SEMI/ANTI join
  *     against that one-column frame inside [[CypherLite.compile]]
  *     (memberOf) — the 100 TB-safe twin of the reference's in-memory
  *     Cypher list (both membership joins share ONE broadcast: the
  *     subtrees are identical, so ReuseExchange dedupes them).
  *
  * Anchors: the head chain is expected to carry an id anchor (the
  * reference binds `$startId`), so every variant's first scan is a
  * pushed equality; an unanchored head still compiles but walks the
  * whole edge frame per length — same cost envelope as the var-length
  * retriever gates.
  */
object CypherPaths {

  private val HeadRe =
    """(?is)^\s*MATCH\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*""".r
  private val UnwindNodesRe =
    """(?is)^\s*nodes\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*""".r
  private val CollectWithRe =
    ("""(?is)^\s*(?:DISTINCT\s+COLLECT\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""" +
      """|COLLECT\s*\(\s*DISTINCT\s+([A-Za-z_][A-Za-z0-9_]*)\s*\))""" +
      """\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*""").r
  private val MemberRe =
    """(?is)^\s*(NOT\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+IN\s+([A-Za-z_][A-Za-z0-9_]*)\s*$""".r

  /** Routed when the query opens with a `p=` path binding. */
  def applies(cypher: String): Boolean =
    HeadRe.findPrefixMatchOf(cypher).nonEmpty

  private val Shape = "MATCH p=(...) [WHERE ...] UNWIND nodes(p) AS n " +
    "WITH DISTINCT COLLECT(n) AS xs MATCH ... [WHERE ... v in xs ...] " +
    "RETURN ..."

  def run(edgeFrame: DataFrame, nodeProps: Option[DataFrame],
          cypher: String): Either[String, DataFrame] = {
    // ---- carve the five clauses -----------------------------------------
    // kwIn: first ws-delimited, quote-aware occurrence of kw in s →
    // (index of the text before it ends, index where the text after
    // it starts), both in s's own coordinates
    def kwIn(s: String, kw: String): Option[(Int, Int)] =
      CypherLite.kwMatch(" " + s + " ", kw)
        .map(k => (math.max(0, k.start - 1), math.min(s.length, k.end - 1)))
    val q0 = cypher.trim.stripSuffix(";").trim
    val hm = HeadRe.findPrefixMatchOf(q0)
      .getOrElse(return Left(s"expected a path binding — $Shape"))
    val pv = hm.group(1)
    val afterHead = q0.substring(hm.end)
    val (uBefore, uAfter) = kwIn(afterHead, "UNWIND")
      .getOrElse(return Left(s"a path binding needs UNWIND nodes($pv) — " +
        Shape))
    val headRegion = afterHead.substring(0, uBefore).trim
    val (chainText, headWhere) = kwIn(headRegion, "WHERE") match {
      case Some((b, a)) => (headRegion.substring(0, b).trim,
        Some(headRegion.substring(a).trim))
      case None => (headRegion, None)
    }
    val afterUnwind = afterHead.substring(uAfter)
    val un = UnwindNodesRe.findPrefixMatchOf(afterUnwind)
      .getOrElse(return Left("after UNWIND, expected " +
        s"nodes($pv) AS <var> — $Shape"))
    if (un.group(1) != pv)
      return Left(s"nodes(${un.group(1)}) does not match the bound " +
        s"path variable '$pv'")
    val nVar = un.group(2)
    val afterNodes = afterUnwind.substring(un.end)
    val (wBefore, wAfter) = kwIn(afterNodes, "WITH")
      .getOrElse(return Left(s"after UNWIND nodes($pv), expected a " +
        s"collecting WITH — $Shape"))
    if (afterNodes.substring(0, wBefore).trim.nonEmpty)
      return Left("unexpected text between UNWIND and WITH: '" +
        afterNodes.trim.take(40) + "'")
    val afterWith = afterNodes.substring(wAfter)
    val cm = CollectWithRe.findPrefixMatchOf(afterWith)
      .getOrElse(return Left("the WITH after UNWIND nodes(...) must be " +
        s"a single collect — $Shape"))
    val collected = Option(cm.group(1)).getOrElse(cm.group(2))
    if (collected != nVar)
      return Left(s"COLLECT($collected) does not match the UNWIND " +
        s"variable '$nVar'")
    val listVar = cm.group(3)
    val tailText = afterWith.substring(cm.end).trim
    if (!tailText.regionMatches(true, 0, "MATCH", 0, 5))
      return Left("after the collecting WITH, expected a second MATCH — " +
        Shape)

    // ---- head chain → per-length variants -------------------------------
    if (CypherLite.topSplit(chainText).size != 1)
      return Left("a path binding covers exactly one chain — " +
        "comma-separated patterns cannot be path-bound")
    val anonCtr = new java.util.concurrent.atomic.AtomicInteger
    val part = CypherLite.parseChain(chainText, anonCtr)
      .fold(e => return Left(e), identity)
    if (part.edges.isEmpty)
      return Left("the bound path has no relationship — nothing to UNWIND")
    if (part.edges.exists(_.minHops == 0))
      return Left(s"nodes($pv) over a *0.. var-length hop is not " +
        "supported — the zero-hop path contributes no relationship")
    if (part.nodes.exists(_.v.startsWith("_pn")))
      return Left("variable names starting with '_pn' collide with the " +
        "path expander's intermediates")
    val variants: Seq[CypherLite.Part] = expandLengths(part)

    // ---- tail: strip membership conjuncts, parse the remainder ----------
    val (rBefore, _) = kwIn(tailText, "RETURN")
      .getOrElse(return Left("the second MATCH needs a RETURN clause"))
    val members = scala.collection.mutable.ArrayBuffer
      .empty[(String, Boolean)]
    val tailQueryText = kwIn(tailText, "WHERE")
      .filter(_._1 < rBefore) match {
      case None => tailText
      case Some((wb, wa)) =>
        val whereRegion = tailText.substring(wa, rBefore)
        val orGroups = CypherLite.boolSplit(whereRegion, "OR")
        val hasMember = orGroups.exists(g =>
          CypherLite.boolSplit(g, "AND").exists(t =>
            MemberRe.findFirstMatchIn(t).exists(_.group(3) == listVar)))
        if (!hasMember) tailText
        else if (orGroups.size > 1)
          return Left(s"membership against '$listVar' must be a " +
            "top-level AND conjunct — OR around it is not supported")
        else {
          val keep = CypherLite.boolSplit(orGroups.head, "AND")
            .filter { t =>
              MemberRe.findFirstMatchIn(t) match {
                case Some(m) if m.group(3) == listVar =>
                  members += ((m.group(2), m.group(1) != null)); false
                case Some(m) =>
                  return Left(s"'${m.group(2)} in ${m.group(3)}' — the " +
                    s"only collected list in scope is '$listVar'")
                case None => true
              }
            }
          val head2 = tailText.substring(0, wb).trim
          val ret2 = tailText.substring(rBefore).trim
          if (keep.isEmpty) s"$head2 $ret2"
          else s"$head2 WHERE ${keep.mkString(" AND ")} $ret2"
        }
    }
    if (members.isEmpty)
      return Left(s"the collected list '$listVar' is never used — add a " +
        s"'<var> in $listVar' membership term to the second MATCH's WHERE")
    val q2 = CypherLite.parse(tailQueryText)
      .fold(e => return Left(s"second MATCH: $e"), identity)
    CypherLite.schemaCheck(q2, nodeProps, edgeFrame)
      .fold(e => return Left(e), identity)
    val mandatoryVars = q2.parts.flatMap(_.nodes.map(_.v)).toSet
    members.foreach { case (v, _) =>
      if (!mandatoryVars.contains(v))
        return Left(s"membership variable '$v' is not bound by a " +
          "mandatory pattern in the second MATCH")
    }

    // ---- compile the entities frame -------------------------------------
    val entityFrames: Seq[DataFrame] = variants.map { p =>
      val text = "MATCH " + render(p) +
        headWhere.fold("")(w => s" WHERE $w") +
        " RETURN " + p.nodes.map(_.v + ".id").mkString(", ")
      val q = CypherLite.parse(text)
        .fold(e => return Left(s"path head: $e"), identity)
      CypherLite.schemaCheck(q, nodeProps, edgeFrame)
        .fold(e => return Left(s"path head: $e"), identity)
      val df = CypherLite.compile(edgeFrame, q,
        if (q.neededProps.nonEmpty) nodeProps else None)
      df.select(explode(array(p.nodes.map(n => col(s"`${n.v}`")): _*))
        .as("__pathnode"))
    }
    val entities = entityFrames.reduce(_ union _).distinct()

    Right(CypherLite.compile(edgeFrame, q2,
      if (q2.neededProps.nonEmpty) nodeProps else None,
      memberOf = members.toSeq.map { case (v, neg) =>
        (v, neg, entities) }))
  }

  /** Cross-product of the per-edge length choices: each var-length edge
    * `*a..b` becomes, per chosen length ℓ, ℓ single hops through fresh
    * `_pn<i>_<j>` intermediates (MaxVarHops bounds ℓ, so the expansion
    * is at most MaxVarHops^edges — tiny). */
  private def expandLengths(part: CypherLite.Part): Seq[CypherLite.Part] = {
    var acc: Seq[(Seq[CypherLite.NodePat], Seq[CypherLite.EdgePat])] =
      Seq((Seq(part.nodes.head), Nil))
    part.edges.zipWithIndex.foreach { case (e, i) =>
      val target = part.nodes(i + 1)
      acc = acc.flatMap { case (ns, es) =>
        (math.max(e.minHops, 1) to e.maxHops).map { len =>
          val mids = (1 until len).map(j =>
            CypherLite.NodePat(s"_pn${i}_$j", None, None))
          val hop = e.copy(minHops = 1, maxHops = 1)
          (ns ++ mids :+ target, es ++ Seq.fill(len)(hop))
        }
      }
    }
    acc.map { case (ns, es) => CypherLite.Part(ns, es) }
  }

  /** Render a fixed-length part back to MATCH-pattern text (the grammar
    * round-trips: ids came from quoted literals, names are identifiers). */
  private def render(p: CypherLite.Part): String = {
    val sb = new StringBuilder
    def node(n: CypherLite.NodePat): Unit = {
      sb += '('
      sb ++= n.v
      n.label.foreach(l => sb ++= s":$l")
      n.idEq.foreach(id => sb ++= s" {id: '$id'}")
      sb += ')'
    }
    node(p.nodes.head)
    p.edges.zipWithIndex.foreach { case (e, i) =>
      val body = e.varName.getOrElse("") +
        (if (e.types.nonEmpty) ":" + e.types.mkString("|") else "")
      if (e.undirected) sb ++= s"-[$body]-"
      else if (e.rightward) sb ++= s"-[$body]->"
      else sb ++= s"<-[$body]-"
      node(p.nodes(i + 1))
    }
    sb.toString
  }
}
