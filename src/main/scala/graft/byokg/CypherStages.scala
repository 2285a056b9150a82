package graft.byokg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multi-stage WITH pipeline + map-literal extension of [[CypherLite]] —
 * the grammar the reference's OWN flagship retrieval query needs
 * (`statements_cypher`, traversal_based_base_retriever.py:153-190):
 * FOUR chained `WITH` stages, `{key: value}` map projections (nested,
 * with `properties(v)` / `split(coalesce(...))` / `NULL` / `[]` values),
 * `collect(distinct x)`, aggregates over map-field arithmetic
 * (`sum(size(topic.statements)/size(topic.chunks))`), and `ORDER BY` on
 * a returned map's field (`ORDER BY result.score DESC`).
 *
 * Spark-first compilation — no interpreter, no per-row walker:
 *
 *  - The MATCH block compiles through [[CypherLite.parse]]/
 *    [[CypherLite.compile]] with a SYNTHESIZED projection holding every
 *    binding and `v.prop` column any later stage reads — so the whole
 *    pattern stays one chain of equi-joins Catalyst can reorder, and
 *    property materialization stays one pruned LEFT join per variable.
 *  - A map literal is a `named_struct` (NOT a MapType: struct fields are
 *    orderable, so map-valued columns can be GROUP BY keys and
 *    `collect_set` elements — exactly what the reference query does when
 *    it groups by the `source` map; Spark refuses MapType in both spots).
 *  - `properties(v)` is the sorted struct of v's property columns
 *    (the staged twin of CypherLite's sorted-key JSON rendering).
 *  - Each WITH stage is ONE `select` (projection stage) or ONE
 *    `groupBy(...).agg(...)` (aggregation stage): n stages with m
 *    aggregations cost exactly m shuffles, the same plan a hand-written
 *    DataFrame pipeline produces. `collect(x)` / `collect(distinct x)`
 *    compile to `array_sort(collect_list/collect_set)` — deterministic
 *    under any partitioning (Cypher leaves collect order unspecified).
 *  - Pattern variables ride through stages as their binding columns;
 *    a LATER stage's `t.value` works because the needed property column
 *    is carried as a hidden pass-through (grouping by it is safe: a
 *    property is functionally dependent on its node binding).
 *
 * Cypher value semantics kept: integer `/` on two integer-kinded
 * operands truncates (Neo4j's behavior — `size(a)/size(b)` is integer
 * division there), `size()` is array length on lists and string length
 * otherwise, `NULL` / `[...]` literals are first-class.
 *
 * Every stage takes Cypher's full clause tail — `[DISTINCT items]
 * [ORDER BY ...] [SKIP n] [LIMIT n] [WHERE ...]` in that
 * (Cypher-grammar) order: the stage's WHERE filters its OUTPUT (HAVING
 * over the implicit aggregation); ORDER BY + SKIP/LIMIT mid-pipeline
 * is the top-k / pagination staging shape (`WITH c, count(*) AS n
 * ORDER BY n DESC LIMIT 5`); a mid-pipeline ORDER BY without
 * SKIP/LIMIT compiles but cannot promise downstream order (collect()
 * is the deterministic sorted list regardless). DISTINCT dedups the
 * stage's projection (refused beside aggregates — the implicit
 * grouping already dedups its keys).
 *
 * Refused loudly (the KGLinker retry-feedback contract): `{}` empty
 * maps, aggregates nested inside expressions or maps, a MATCH after any
 * WITH stage in a multi-stage pipeline, stage clauses out of Cypher's
 * order, WHERE after RETURN, expression items without `AS`,
 * `properties()` of a non-pattern value, multi-level property paths on
 * pattern variables, and ORDER BY fields that don't resolve against
 * the returned schema.
 *
 * Scale: the one corpus-wide exchange per aggregation stage is keyed on
 * that stage's grouping tuple; everything else is in-row struct
 * construction (codegen'd `named_struct`/`array_sort`). The reference
 * executes this query per retrieval round-trip against its graph store;
 * here the same text compiles into one Spark job.
 */
object CypherStages {

  // ---- value expressions (superset of CypherLite.Expr) ------------------

  /** Staged-pipeline expression: adds map/list/null literals, multi-level
    * field paths and `properties(v)` to the scalar layer. */
  sealed trait MExpr {
    /** Every (base, path) reference this expression reads. */
    def refs: Seq[(String, Seq[String])] = this match {
      case MExpr.Ref(b, p) => Seq(b -> p)
      case MExpr.Fn(_, args) => args.flatMap(_.refs)
      case MExpr.Bin(_, l, r) => l.refs ++ r.refs
      case MExpr.MapLit(es) => es.flatMap(_._2.refs)
      case MExpr.ListLit(is) => is.flatMap(_.refs)
      case MExpr.MapProj(b, fields) => fields.map(f => b -> Seq(f))
      case _ => Nil
    }
  }
  object MExpr {
    final case class Ref(base: String, path: Seq[String]) extends MExpr
    final case class Str(s: String) extends MExpr
    final case class IntLit(v: Long) extends MExpr
    final case class DblLit(v: Double) extends MExpr
    case object NullLit extends MExpr
    final case class MapLit(entries: Seq[(String, MExpr)]) extends MExpr
    final case class ListLit(items: Seq[MExpr]) extends MExpr
    /** Cypher map projection `v{.a, .b, .*}` — sugar for a map literal
      * of the variable's properties (".*" expands to every property not
      * already listed; ".id" is the binding). The reference's
      * node_result() helper emits exactly this shape
      * (graph_utils.py:121-157). */
    final case class MapProj(base: String, fields: Seq[String])
      extends MExpr
    /** name normalized lowercase; "properties" included. */
    final case class Fn(name: String, args: Seq[MExpr]) extends MExpr
    final case class Bin(op: Char, l: MExpr, r: MExpr) extends MExpr

    val Functions: Map[String, (Int, Int)] = Map(
      "coalesce" -> (2, 8), "size" -> (1, 1), "tolower" -> (1, 1),
      "toupper" -> (1, 1), "trim" -> (1, 1), "split" -> (2, 2),
      "tostring" -> (1, 1), "properties" -> (1, 1), "id" -> (1, 1),
      "labels" -> (1, 1), "type" -> (1, 1))

    /** Aggregate heads — loud Left when found INSIDE an expression (they
      * are only legal as the whole body of a stage item). */
    val AggNames: Set[String] =
      Set("count", "sum", "min", "max", "avg", "collect")
  }

  /** Recursive-descent parser for [[MExpr]] — precedence `* / %` over
    * `+ -`, parens group; single- OR double-quoted string literals (the
    * reference's own query text uses `""`). */
  private final class MParser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length &&
      input.charAt(pos).isWhitespace) pos += 1
    private def peek: Char =
      if (pos < input.length) input.charAt(pos) else ' '
    private def fail(msg: String): Either[String, Nothing] =
      Left(s"$msg at '${input.substring(math.min(pos, input.length)).take(30)}'")

    def parseAll(): Either[String, MExpr] =
      expr().flatMap { e =>
        ws()
        if (pos < input.length) fail("unexpected trailing input")
        else Right(e)
      }

    private def expr(): Either[String, MExpr] =
      binChain(() => term(), Set('+', '-'))
    private def term(): Either[String, MExpr] =
      binChain(() => factor(), Set('*', '/', '%'))

    private def binChain(sub: () => Either[String, MExpr],
                         ops: Set[Char]): Either[String, MExpr] = {
      var acc = sub() match { case Right(e) => e; case l => return l }
      ws()
      while (ops.contains(peek)) {
        val op = peek; pos += 1
        sub() match {
          case Right(r) => acc = MExpr.Bin(op, acc, r)
          case l => return l
        }
        ws()
      }
      Right(acc)
    }

    private val IdentRe = """[A-Za-z_][A-Za-z0-9_]*""".r

    private def strLit(q: Char): Either[String, MExpr] = {
      val end = input.indexOf(q, pos + 1)
      if (end < 0) fail("unterminated string literal")
      else { val s = input.substring(pos + 1, end); pos = end + 1
        Right(MExpr.Str(s)) }
    }

    private def factor(): Either[String, MExpr] = {
      ws()
      peek match {
        case '(' =>
          pos += 1
          expr().flatMap { e =>
            ws()
            if (peek == ')') { pos += 1; Right(e) }
            else fail("expected ')'")
          }
        case '{' =>
          pos += 1
          val entries =
            scala.collection.mutable.ArrayBuffer.empty[(String, MExpr)]
          ws()
          if (peek == '}')
            return Left("empty map literals {} are not supported — " +
              "give the map at least one key (structs need a field)")
          var more = true
          while (more) {
            ws()
            val km = IdentRe.findPrefixMatchOf(input.substring(pos))
              .getOrElse(return fail("expected a map key identifier"))
            val key = km.group(0); pos += km.end
            ws()
            if (peek != ':') return fail(s"expected ':' after map key '$key'")
            pos += 1
            expr() match {
              case Right(e) => entries += key -> e
              case l => return l
            }
            ws()
            if (peek == ',') { pos += 1; more = true } else more = false
          }
          ws()
          if (peek != '}') fail("expected '}' to close the map literal")
          else {
            pos += 1
            if (entries.map(_._1).distinct.size != entries.size)
              Left("duplicate keys in map literal")
            else Right(MExpr.MapLit(entries.toSeq))
          }
        case '[' =>
          pos += 1
          val items = scala.collection.mutable.ArrayBuffer.empty[MExpr]
          ws()
          if (peek == ']') { pos += 1; return Right(MExpr.ListLit(Nil)) }
          var more = true
          while (more) {
            expr() match {
              case Right(e) => items += e
              case l => return l
            }
            ws()
            if (peek == ',') { pos += 1; more = true } else more = false
          }
          if (peek != ']') fail("expected ']' to close the list literal")
          else { pos += 1; Right(MExpr.ListLit(items.toSeq)) }
        case '\'' => strLit('\'')
        case '"' => strLit('"')
        case c if c.isDigit ||
            (c == '-' && pos + 1 < input.length &&
              input.charAt(pos + 1).isDigit) =>
          val m = """-?\d+(?:\.\d+)?""".r
            .findPrefixMatchOf(input.substring(pos)).get
          pos += m.end
          val tok = m.group(0)
          if (tok.contains('.')) Right(MExpr.DblLit(tok.toDouble))
          else Right(MExpr.IntLit(tok.toLong))
        case c if c.isLetter || c == '_' =>
          val m = IdentRe.findPrefixMatchOf(input.substring(pos)).get
          val ident = m.group(0); pos += m.end
          if (ident.equalsIgnoreCase("null")) return Right(MExpr.NullLit)
          ws()
          if (peek == '(') {
            pos += 1
            val name = ident.toLowerCase
            if (MExpr.AggNames.contains(name))
              return Left(s"aggregate $ident(...) cannot appear inside an " +
                "expression or map literal — aggregate at the top level " +
                "of a WITH/RETURN item and reference its alias")
            MExpr.Functions.get(name) match {
              case None => Left(s"unknown function '$ident' — supported: " +
                "coalesce, size, toLower, toUpper, trim, split, " +
                "toString, properties")
              case Some((lo, hi)) =>
                val args = scala.collection.mutable.ArrayBuffer.empty[MExpr]
                ws()
                if (peek != ')') {
                  var more = true
                  while (more) {
                    expr() match {
                      case Right(e) => args += e
                      case l => return l
                    }
                    ws()
                    if (peek == ',') { pos += 1; more = true }
                    else more = false
                  }
                }
                if (peek != ')') return fail("expected ')' in call")
                pos += 1
                if (args.size < lo || args.size > hi)
                  Left(s"$ident() takes " +
                    (if (lo == hi) s"$lo" else s"$lo-$hi") +
                    s" arguments, got ${args.size}")
                else if (name == "split" && !args(1).isInstanceOf[MExpr.Str])
                  Left("split() needs a literal string delimiter")
                else if (Set("properties", "id", "labels", "type")
                    .contains(name) &&
                  !(args.head match {
                    case MExpr.Ref(_, p) => p.isEmpty
                    case _ => false
                  }))
                  Left(s"$name() takes a bare pattern variable")
                else Right(MExpr.Fn(name, args.toSeq))
            }
          } else if (peek == '{') {
            // map projection v{.a, .b, .*} (node_result's shape)
            pos += 1
            val fields = scala.collection.mutable.ArrayBuffer.empty[String]
            var more = true
            while (more) {
              ws()
              if (peek != '.')
                return fail("map projection " + ident + "{...} items " +
                  "start with '.'")
              pos += 1
              if (peek == '*') { fields += "*"; pos += 1 }
              else IdentRe.findPrefixMatchOf(input.substring(pos)) match {
                case Some(pm) => fields += pm.group(0); pos += pm.end
                case None => return fail("expected a property after '.'")
              }
              ws()
              if (peek == ',') { pos += 1; more = true } else more = false
            }
            if (peek != '}') fail("expected '}' to close the map projection")
            else { pos += 1; Right(MExpr.MapProj(ident, fields.toSeq)) }
          } else {
            val path = scala.collection.mutable.ArrayBuffer.empty[String]
            while (peek == '.') {
              pos += 1
              IdentRe.findPrefixMatchOf(input.substring(pos)) match {
                case Some(pm) => path += pm.group(0); pos += pm.end
                case None => return fail(s"expected a field after '.'")
              }
              ws()
            }
            Right(MExpr.Ref(ident, path.toSeq))
          }
        case _ => fail("expected an expression operand")
      }
    }
  }

  def parseMExpr(s: String): Either[String, MExpr] = new MParser(s).parseAll()

  // ---- stage items -------------------------------------------------------

  sealed trait StageItem { def alias: String }
  /** A projection item: `expr AS alias`, or a bare pass-through name
    * (`t` — alias == the name, expr == Ref(name, Nil)). */
  final case class PlainItem(expr: MExpr, alias: String,
                             bare: Boolean) extends StageItem
  /** An aggregate item. func ∈ count_star | count | count_distinct |
    * collect | collect_distinct | sum | min | max | avg. */
  final case class AggStageItem(func: String, arg: Option[MExpr],
                                alias: String,
                                slice: Option[(Int, Int)] = None)
    extends StageItem

  /** One WITH/RETURN stage: items, then the optional Cypher clause tail
    * in grammar order — `[ORDER BY ...] [LIMIT n] [WHERE ...]` (Cypher
    * puts the stage's WHERE after its pagination; it filters the
    * already-limited rows). `where` is DNF like CypherLite: outer OR of
    * AND groups of (left, op, right) expression comparisons resolved
    * against the STAGE'S OUTPUTS. Mid-pipeline ORDER BY without LIMIT
    * compiles but is a semantic no-op (downstream aggregation re-sorts;
    * collect() is the deterministic sorted list regardless). */
  final case class Stage(items: Seq[StageItem],
                         where: Seq[Seq[(MExpr, String, MExpr)]] = Nil,
                         orderBy: Seq[(Seq[String], Boolean)] = Nil,
                         limit: Option[Int] = None,
                         skip: Option[Int] = None,
                         distinct: Boolean = false,
                         // `[OPTIONAL] MATCH <pattern> [WHERE ...]`
                         // closing the stage: the pattern expands the
                         // running frame before the NEXT stage's items
                         // (optional?, pattern text without the MATCH
                         // keyword)
                         matchBlock: Option[(Boolean, String)] = None) {
    def aggs: Seq[AggStageItem] = items.collect { case a: AggStageItem => a }
    def plains: Seq[PlainItem] = items.collect { case p: PlainItem => p }
  }

  /** head = the MATCH [WHERE] block; stages = chained WITH stages; ret =
    * the RETURN stage (its orderBy paths resolve against the returned
    * schema — alias, optionally .field...; a WHERE on RETURN is
    * refused). */
  final case class StagedQuery(head: String, stages: Seq[Stage], ret: Stage)

  // ---- text scanning -----------------------------------------------------

  /** Positions of every top-level WITH keyword (quote-aware linear scan;
    * excludes STARTS WITH / ENDS WITH like [[CypherLite.withMatch]]). */
  private def withPositions(s: String): Seq[(Int, Int)] =
    CypherLite.kwScan(s, "WITH", excludeStartsEnds = true)
      .map(k => (k.start, k.end))

  /** Comma split at paren/brace/bracket/quote depth zero — map and list
    * literals carry commas [[CypherLite.topSplit]] must not split on. */
  private def topSplitDeep(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var q = ' '; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.toSeq
  }

  /** Rightmost top-level ` AS alias` suffix of an item. */
  private val AsSuffixRe =
    """(?is)^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$""".r

  /** `AS` at depth zero? (an `AS` inside a map/list/call is part of a
    * nested... actually AS never nests — but keep the split safe by
    * checking the suffix form only, which cannot cut a literal). */
  private def splitAs(item: String): (String, Option[String]) = item match {
    case AsSuffixRe(body, alias)
      if balanced(body) => (body.trim, Some(alias))
    case _ => (item.trim, None)
  }

  private def balanced(s: String): Boolean = {
    var depth = 0; var q = ' '
    s.foreach { c =>
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case _ =>
      }
    }
    depth == 0 && q == ' '
  }

  private val BareIdentRe = """^[A-Za-z_][A-Za-z0-9_]*$""".r
  private val AggHeadRe =
    """(?is)^(count|sum|min|max|avg|collect)\s*\((.*)\)$""".r
  private val DistinctPrefixRe = """(?is)^DISTINCT\s+(.*)$""".r

  private val SliceSufRe =
    """(?s)^(.*)\[\s*(\d*)\s*\.\.\s*(\d+)\s*\]$""".r

  private def parseItem(raw: String): Either[String, StageItem] = {
    val (body0, aliasOpt) = splitAs(raw)
    // Cypher list slice on a collect: `collect(DISTINCT x)[0..n]` /
    // `[..n]` — the reference's neighbour-cap idiom
    // (entity_context_provider.py:58, topic_beam_search.py:199)
    val (body, sliceOpt) = body0 match {
      case SliceSufRe(core, a, b)
        if AggHeadRe.findFirstIn(core.trim).nonEmpty =>
        (core.trim, Some(((if (a.isEmpty) 0 else a.toInt), b.toInt)))
      case _ => (body0, None)
    }
    sliceOpt.foreach { case (a, b) =>
      if (a < 0 || b < a)
        return Left(s"bad slice bounds [$a..$b]")
    }
    if (BareIdentRe.findFirstIn(body).nonEmpty &&
        !body.equalsIgnoreCase("null"))
      return Right(PlainItem(MExpr.Ref(body, Nil),
        aliasOpt.getOrElse(body), bare = aliasOpt.isEmpty))
    body match {
      case AggHeadRe(f0, inner0) if balanced(inner0) =>
        val f = f0.toLowerCase
        val inner = inner0.trim
        // Cypher names an unaliased aggregate column by its text —
        // single-space normalized so ORDER BY can match it
        val alias = aliasOpt.getOrElse(
          body.trim.replaceAll("\\s+", " "))
        if (f == "count" && inner == "*")
          return Right(AggStageItem("count_star", None, alias))
        val (distinct, argText) = inner match {
          case DistinctPrefixRe(rest) => (true, rest.trim)
          case _ => (false, inner)
        }
        if (distinct && f != "collect" && f != "count")
          return Left(s"DISTINCT is supported on collect() and count() " +
            s"only, not $f()")
        if (sliceOpt.nonEmpty && f != "collect")
          return Left(s"[..] slicing applies to collect() lists, not $f()")
        parseMExpr(argText).map { e =>
          val func = (f, distinct) match {
            case ("collect", true) => "collect_distinct"
            case ("count", true) => "count_distinct"
            case (other, _) => other
          }
          AggStageItem(func, Some(e), alias, sliceOpt)
        }
      case _ =>
        aliasOpt match {
          case None => Left(s"expression item '$raw' needs an alias — " +
            "AS name (Cypher requires aliases for non-variable WITH items)")
          case Some(a) =>
            parseMExpr(body).map(e => PlainItem(e, a, bare = false))
        }
    }
  }

  /** The depth-zero comparison operator of a WHERE term (outside quotes
    * and map/list/call nesting). */
  private def splitCompare(t: String): Either[String, (MExpr, String, MExpr)] = {
    var depth = 0; var q = ' '; var i = 0
    var opAt = -1; var opLen = 0
    while (i < t.length && opAt < 0) {
      val c = t.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case '>' | '<' | '=' if depth == 0 =>
          opAt = i
          opLen =
            if (i + 1 < t.length && (t.substring(i, i + 2) == ">=" ||
              t.substring(i, i + 2) == "<=" || t.substring(i, i + 2) == "<>"))
              2
            else 1
        case _ =>
      }
      i += 1
    }
    if (opAt < 0) return Left(s"no comparison operator in WHERE term '$t'")
    for {
      l <- parseMExpr(t.substring(0, opAt).trim)
      r <- parseMExpr(t.substring(opAt + opLen).trim)
    } yield (l, t.substring(opAt, opAt + opLen), r)
  }

  private def parseStage(text0: String): Either[String, Stage] = {
    // a `[OPTIONAL] MATCH` closing the stage text opens a mid-pipeline
    // pattern expansion (the reference's entity_vss_provider /
    // entity_from_top_statement shapes): carve it off, parse the stage
    // core as before
    val (coreText, matchBlock) =
      CypherLite.kwMatch(" " + text0 + " ", "MATCH") match {
        case None => (text0, None)
        case Some(k) =>
          val mStart = k.start // index of the ws before MATCH in padded
          val before0 = text0.substring(0, math.max(0, mStart - 1))
          val beforeU = before0.trim.toUpperCase
          val optional = beforeU.endsWith("OPTIONAL")
          val before =
            if (optional)
              before0.trim.dropRight("OPTIONAL".length).trim
            else before0.trim
          // k.end is past "MATCH" + one ws in padded coords → -1 in text0
          (before, Some((optional, text0.substring(k.end - 1).trim)))
      }
    val text1 = coreText
    // clause tail in Cypher grammar order:
    // [ORDER BY] [SKIP] [LIMIT] [WHERE]
    val pad = " " + text1 + " "
    val ordAt = CypherLite.kwMatch(pad, "ORDER").map(_.start)
    val skipAt = CypherLite.kwMatch(pad, "SKIP").map(_.start)
    val limAt = CypherLite.kwMatch(pad, "LIMIT").map(_.start)
    val whereAt = CypherLite.kwMatch(pad, "WHERE").map(_.start)
    val marks = Seq(ordAt.map(_ -> "ORDER"), skipAt.map(_ -> "SKIP"),
      limAt.map(_ -> "LIMIT"), whereAt.map(_ -> "WHERE"))
      .flatten.sortBy(_._1)
    val wantOrder = Seq("ORDER", "SKIP", "LIMIT", "WHERE")
    if (marks.map(_._2) != wantOrder.filter(marks.map(_._2).contains))
      return Left("stage clauses must follow Cypher's order: items " +
        "[ORDER BY ...] [SKIP n] [LIMIT n] [WHERE ...]")
    def region(from: Int): String = {
      val end = marks.map(_._1).find(_ > from).getOrElse(pad.length)
      pad.substring(from, end)
    }
    val itemsText0 = pad.substring(0,
      marks.headOption.map(_._1).getOrElse(pad.length)).trim
    val distinct = itemsText0.toUpperCase.startsWith("DISTINCT ")
    val itemsText =
      if (distinct) itemsText0.substring(9).trim else itemsText0
    val ordClause = ordAt.map(a => region(a).trim)
    val skipClause = skipAt.map(a => region(a).trim)
    val limClause = limAt.map(a => region(a).trim)
    val whereClause = whereAt.map(a => region(a).trim)

    val orderBy: Seq[(Seq[String], Boolean)] = ordClause match {
      case None => Nil
      case Some(c0) =>
        val c = c0.replaceFirst("(?i)^ORDER\\s+", "")
        if (!c.toUpperCase.startsWith("BY "))
          return Left("expected BY after ORDER")
        topSplitDeep(c.substring(3).trim).map { it =>
          val OrdItemRe =
            """(?is)^([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)(?:\s+(ASC|DESC))?$""".r
          val OrdAggRe =
            """(?is)^((?:count|sum|min|max|avg|collect)\s*\(.*\))(?:\s+(ASC|DESC))?$""".r
          it match {
            case OrdItemRe(path, dir) =>
              (path.split("\\.").toSeq,
                dir == null || dir.equalsIgnoreCase("ASC"))
            case OrdAggRe(txt, dir) =>
              // matches an unaliased aggregate item by its normalized
              // text (`ORDER BY count(entity) DESC`)
              (Seq(txt.trim.replaceAll("\\s+", " ")),
                dir == null || dir.equalsIgnoreCase("ASC"))
            case other =>
              return Left(s"unsupported ORDER BY item '$other'")
          }
        }
    }
    val limit: Option[Int] = limClause match {
      case None => None
      case Some(c) =>
        val lit = c.replaceFirst("(?i)^LIMIT\\s+", "").trim
        Some(lit.toIntOption.getOrElse(
          return Left(s"bad LIMIT literal '$lit'")))
    }
    val skip: Option[Int] = skipClause match {
      case None => None
      case Some(c) =>
        val lit = c.replaceFirst("(?i)^SKIP\\s+", "").trim
        Some(lit.toIntOption.getOrElse(
          return Left(s"bad SKIP literal '$lit'")))
    }
    val where: Seq[Seq[(MExpr, String, MExpr)]] = whereClause match {
      case None => Nil
      case Some(c0) =>
        val c = c0.replaceFirst("(?i)^WHERE\\s+", "")
        CypherLite.boolSplit(c, "OR").map { grp =>
          CypherLite.boolSplit(grp, "AND").map { term =>
            splitCompare(term).fold(e => return Left(e), identity)
          }
        }
    }
    if (itemsText.isEmpty) return Left("empty WITH/RETURN item list")
    val items = topSplitDeep(itemsText)
    if (items.exists(_.isEmpty)) return Left("empty WITH/RETURN item")
    val parsed = items.map(parseItem)
    parsed.collectFirst { case Left(e) => e }
      .toLeft(Stage(parsed.map(_.toOption.get), where, orderBy, limit,
        skip, distinct, matchBlock))
      .flatMap { st =>
        val names = st.items.map(_.alias)
        if (names.distinct.size != names.size)
          Left("duplicate output names in a WITH/RETURN stage — " +
            "disambiguate with AS")
        else if (st.distinct && st.aggs.nonEmpty)
          Left("DISTINCT cannot combine with aggregates in one stage — " +
            "the implicit grouping already dedups the keys")
        else Right(st)
      }
  }

  // ---- query splitting ---------------------------------------------------

  /** Should this query route to the staged compiler? True when it chains
    * two or more WITH stages, or any WITH/RETURN item list carries a map
    * literal / list literal / collect(DISTINCT ...) — the surfaces the
    * legacy closed-form paths do not speak. */
  def applies(q: String): Boolean = {
    val s = q.trim.stripSuffix(";")
    val ws = withPositions(s)
    if (ws.size >= 2) return true
    val rm = CypherLite.kwMatch(s, "RETURN")
    val regionStart = ws.headOption.map(_._2).orElse(rm.map(_.end))
      .getOrElse(return false)
    val tail = s.substring(regionStart)
    val mapLit = {
      // a '{' at quote depth zero in the items region (pattern property
      // maps live BEFORE the first WITH/RETURN, so they never land here;
      // the single-WITH ... MATCH tail can carry one — excluded below)
      var q0 = ' '; var found = false
      tail.foreach { c =>
        if (q0 != ' ') { if (c == q0) q0 = ' ' }
        else c match {
          case '\'' | '"' => q0 = c
          case '{' => found = true
          case _ =>
        }
      }
      found
    }
    val collectDistinct =
      "(?is)collect\\s*\\(\\s*DISTINCT\\s".r.findFirstIn(tail).nonEmpty
    val tailMatch = ws.nonEmpty &&
      CypherLite.kwMatch(" " + tail + " ", "MATCH").nonEmpty
    // a single WITH stage carrying its own ORDER BY / LIMIT (the
    // mid-pipeline top-k clause tail) is staged grammar too — the
    // legacy pipeline only speaks the items [WHERE] form
    val stageTail = ws.size == 1 && rm.exists(_.start > ws.head._2) && {
      val between = s.substring(ws.head._2, rm.get.start)
      val pad = " " + between + " "
      !tailMatch && (CypherLite.kwMatch(pad, "ORDER").nonEmpty ||
        CypherLite.kwMatch(pad, "LIMIT").nonEmpty ||
        CypherLite.kwMatch(pad, "SKIP").nonEmpty ||
        between.trim.toUpperCase.startsWith("DISTINCT "))
    }
    // a RETURN-side aggregate after a WITH stage is a SECOND
    // aggregation stage (the lexical_graph_index stats shape, :673) —
    // only the staged compiler speaks it
    val retAgg = ws.size == 1 && !tailMatch && rm.exists { r =>
      "(?is)\\b(count|sum|min|max|avg|collect)\\s*\\(".r
        .findFirstIn(s.substring(r.end)).nonEmpty
    }
    ((mapLit || collectDistinct) && !tailMatch) || stageTail || retAgg
  }

  def parseStaged(q0: String): Either[String, StagedQuery] = {
    val s = q0.trim.stripSuffix(";").trim
    if (!s.toUpperCase.startsWith("MATCH "))
      return Left("staged pipelines start with a MATCH block")
    val ws = withPositions(s)
    val rm = CypherLite.kwMatch(s, "RETURN").getOrElse(
      return Left("missing RETURN clause"))
    if (ws.exists(_._1 > rm.start))
      return Left("WITH after RETURN is not supported")
    val head = s.substring(0, ws.headOption.map(_._1).getOrElse(rm.start))
      .trim
    val stageTexts: Seq[String] = ws.zipWithIndex.map { case ((_, e), i) =>
      val end = if (i + 1 < ws.size) ws(i + 1)._1 else rm.start
      s.substring(e, end).trim
    }
    val retText = s.substring(rm.end).trim
    val stages = stageTexts.map(t =>
      parseStage(t).fold(e => return Left(e), identity))
    val ret = parseStage(retText).fold(e => return Left(e), identity)
    if (ret.where.nonEmpty)
      return Left("WHERE cannot follow RETURN — filter in a WITH stage")
    if (ret.matchBlock.nonEmpty)
      return Left("MATCH cannot follow RETURN")
    Right(StagedQuery(head, stages, ret))
  }

  // ---- compilation -------------------------------------------------------

  private def kindOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType | _: DecimalType => "num"
    case StringType => "str"
    case _: ArrayType => "arr"
    case _: StructType => "struct"
    case _ => "any"
  }

  /** Resolve a dotted path against a frame's schema: start from the
    * dotted pattern-prop column (`v.p`), the bare column, or Left; walk
    * remaining fields through struct types. Returns the column and its
    * resolved kind. */
  private def resolveRef(df: DataFrame, base: String, path: Seq[String])
  : Either[String, (Column, String)] = {
    val cols = df.columns.toSet
    def fieldWalk(start: Column, dt: DataType, fields: Seq[String],
                  at: String): Either[String, (Column, String)] =
      fields match {
        case Nil => Right((start, kindOf(dt)))
        case f +: rest => dt match {
          case st: StructType => st.find(_.name == f) match {
            case Some(sf) =>
              fieldWalk(start.getField(f), sf.dataType, rest, s"$at.$f")
            case None => Left(s"no field '$f' on '$at' — fields: " +
              st.fieldNames.sorted.mkString(", "))
          }
          case other => Left(s"'$at' is ${other.simpleString}, not a map " +
            s"— cannot access '.$f'")
        }
      }
    if (path.nonEmpty && cols.contains(s"$base.${path.head}")) {
      val name = s"$base.${path.head}"
      fieldWalk(col(s"`$name`"), df.schema(name).dataType, path.tail, name)
    } else if (cols.contains(base)) {
      val dt = df.schema(base).dataType
      (path, dt) match {
        case (Seq("id"), t) if !t.isInstanceOf[StructType] =>
          Right((col(s"`$base`"), kindOf(dt))) // v.id = the binding itself
        case (Nil, _) => Right((col(s"`$base`"), kindOf(dt)))
        case (p, st: StructType) => fieldWalk(col(s"`$base`"), st, p, base)
        case (p, _) => Left(s"'$base.${p.mkString(".")}' — '$base' " +
          "carries no such property in this stage's scope (project it " +
          "through the preceding WITH items)")
      }
    } else Left(s"unknown name '$base' — stage scope has: " +
      df.columns.sorted.mkString(", "))
  }

  /** Property columns available for `properties(v)` in the current frame:
    * every `v.p` column, sorted by property name. */
  private def propCols(df: DataFrame, v: String): Seq[String] =
    df.columns.filter(_.startsWith(v + ".")).map(_.drop(v.length + 1))
      .toSeq.sorted

  /** Compile one expression against the stage frame. Returns the column
    * and its inferred kind (int | num | str | arr | struct | any). */
  private def compileMExpr(df: DataFrame, e: MExpr)
  : Either[String, (Column, String)] = e match {
    case MExpr.Ref(b, p) => resolveRef(df, b, p)
    case MExpr.Str(s) => Right((lit(s), "str"))
    case MExpr.IntLit(v) => Right((lit(v), "int"))
    case MExpr.DblLit(v) => Right((lit(v), "num"))
    case MExpr.NullLit => Right((lit(null).cast("string"), "any"))
    case MExpr.MapLit(entries) =>
      val cs = entries.map { case (k, ex) =>
        compileMExpr(df, ex).fold(err => return Left(err),
          { case (c, _) => c.as(k) })
      }
      Right((struct(cs: _*), "struct"))
    case MExpr.ListLit(Nil) =>
      Right((array().cast("array<string>"), "arr"))
    case MExpr.ListLit(items) =>
      val cs = items.map(compileMExpr(df, _)
        .fold(err => return Left(err), _._1))
      Right((array(cs: _*), "arr"))
    case MExpr.Fn("properties", Seq(MExpr.Ref(v, Seq()))) =>
      val ps = propCols(df, v)
      if (ps.isEmpty)
        Left(s"properties($v): '$v' carries no property columns in this " +
          "stage's scope — properties() applies to pattern variables " +
          "in the first stage after MATCH")
      else if (!df.columns.contains(v))
        Left(s"properties($v): '$v' is not bound in this stage's scope")
      else
        Right((when(col(s"`$v`").isNull, lit(null))
          .otherwise(struct(ps.map(p =>
            col(s"`$v.$p`").as(p)): _*)), "struct"))
    case MExpr.Fn("coalesce", args) =>
      val compiled = args.map(compileMExpr(df, _)
        .fold(err => return Left(err), identity))
      Right((coalesce(compiled.map(_._1): _*),
        compiled.map(_._2).find(_ != "any").getOrElse("any")))
    case MExpr.Fn("size", Seq(a)) =>
      compileMExpr(df, a).map { case (c, k) =>
        if (k == "arr") (size(c), "int")
        else if (k == "struct") return Left(
          "size() of a map is not supported — size() takes a list or string")
        else (length(c.cast("string")), "int")
      }
    case MExpr.Fn("tolower", Seq(a)) =>
      compileMExpr(df, a).map { case (c, _) => (lower(c), "str") }
    case MExpr.Fn("toupper", Seq(a)) =>
      compileMExpr(df, a).map { case (c, _) => (upper(c), "str") }
    case MExpr.Fn("trim", Seq(a)) =>
      compileMExpr(df, a).map { case (c, _) => (trim(c), "str") }
    case MExpr.Fn("tostring", Seq(a)) =>
      compileMExpr(df, a).map { case (c, _) => (c.cast("string"), "str") }
    case MExpr.Fn("split", Seq(a, MExpr.Str(d))) =>
      compileMExpr(df, a).map { case (c, _) =>
        (split(c, java.util.regex.Pattern.quote(d)), "arr") }
    // id(v)/ID(v): the node's identity — in this store, the binding;
    // type(r): a relationship binding IS its type
    case MExpr.Fn("id" | "type", Seq(a)) => compileMExpr(df, a)
    // labels(v): id-prefix labels, as a one-element list
    case MExpr.Fn("labels", Seq(a)) =>
      compileMExpr(df, a).map { case (c, _) =>
        (array(substring_index(c, ":", 1)), "arr") }
    case MExpr.MapProj(v, fields) =>
      if (!df.columns.contains(v))
        return Left(s"$v{...}: '$v' is not bound in this stage's scope")
      val explicit = fields.filter(_ != "*")
      if (explicit.distinct.size != explicit.size)
        return Left(s"duplicate fields in map projection $v{...}")
      val starFields =
        if (fields.contains("*")) propCols(df, v).filterNot(explicit.contains)
        else Nil
      val all = explicit ++ starFields
      if (all.isEmpty)
        return Left(s"$v{.*}: '$v' carries no property columns in this " +
          "stage's scope")
      val entries = all.map { f =>
        (if (f == "id") col(s"`$v`")
         else if (df.columns.contains(s"$v.$f")) col(s"`$v.$f`")
         else return Left(s"$v{.$f}: no property '$f' in scope — have: " +
           ("id" +: propCols(df, v)).mkString(", "))).as(f)
      }
      Right((when(col(s"`$v`").isNull, lit(null))
        .otherwise(struct(entries: _*)), "struct"))
    case MExpr.Bin(op, l, r) =>
      val (lc, lk) = compileMExpr(df, l).fold(err => return Left(err),
        identity)
      val (rc, rk) = compileMExpr(df, r).fold(err => return Left(err),
        identity)
      if (op == '+' && (lk == "str" || rk == "str")) {
        // Cypher string concatenation: `+` with a string operand
        // concatenates (null propagates, like Cypher's null + x)
        Right((concat(lc.cast("string"), rc.cast("string")), "str"))
      } else if (lk == "int" && rk == "int") {
        // Cypher integer arithmetic: int op int stays integral, and `/`
        // TRUNCATES (Neo4j: size(a)/size(b) is integer division)
        val (ll, rl) = (lc.cast("long"), rc.cast("long"))
        val out = op match {
          case '+' => ll + rl
          case '-' => ll - rl
          case '*' => ll * rl
          case '/' => (ll.cast("double") / rl.cast("double")).cast("long")
          case '%' => ll % rl
        }
        Right((out, "int"))
      } else {
        val (ld, rd) = (lc.try_cast("double"), rc.try_cast("double"))
        val out = op match {
          case '+' => ld + rd
          case '-' => ld - rd
          case '*' => ld * rd
          case '/' => ld / rd
          case '%' => ld % rd
        }
        Right((out, "num"))
      }
    case other => Left(s"unsupported expression shape: $other")
  }

  /** Apply the item's `[a..b]` slice (Cypher half-open, 0-based) to the
    * collected list — slice() is 1-based with a length. */
  private def withSlice(c: Column, a: AggStageItem): Column =
    a.slice.fold(c) { case (from, until) =>
      slice(c, from + 1, math.max(until - from, 0)) }

  private def compileAgg(df: DataFrame, a: AggStageItem)
  : Either[String, Column] = {
    def arg: Either[String, (Column, String)] =
      compileMExpr(df, a.arg.getOrElse(
        return Left(s"${a.func} needs an argument")))
    a.func match {
      case "count_star" => Right(count(lit(1)).as(a.alias))
      case "count" => arg.map { case (c, _) => count(c).as(a.alias) }
      case "count_distinct" =>
        arg.map { case (c, _) => count_distinct(c).as(a.alias) }
      // collect(): deterministic SORTED list (Cypher leaves the order
      // unspecified; array_sort makes it stable under any partitioning
      // and SQL-replayable — same discipline as CypherLite's collect)
      case "collect" =>
        arg.map { case (c, _) =>
          withSlice(array_sort(collect_list(c)), a).as(a.alias) }
      case "collect_distinct" =>
        arg.map { case (c, _) =>
          withSlice(array_sort(collect_set(c)), a).as(a.alias) }
      case "sum" => arg.map { case (c, k) =>
        (if (k == "int") sum(c) else sum(c.try_cast("double"))).as(a.alias) }
      case "avg" =>
        arg.map { case (c, _) => avg(c.try_cast("double")).as(a.alias) }
      case "min" => arg.map { case (c, _) => min(c).as(a.alias) }
      case "max" => arg.map { case (c, _) => max(c).as(a.alias) }
      case other => Left(s"unknown aggregate '$other'")
    }
  }

  /** One WITH/RETURN stage over the running frame: a single `select`
    * (pure projection) or a single `groupBy(...).agg(...)` keyed on the
    * plain items (Cypher's implicit grouping). `hidden` names dotted
    * pattern-property columns later stages still read — carried along
    * (and, in an aggregation, added to the keys: a property is
    * functionally dependent on its node binding, so groups are
    * unchanged). */
  private def compileStageFrame(df: DataFrame, st: Stage,
                                hidden: Seq[String])
  : Either[String, DataFrame] = {
    val plainCols: Seq[Column] = st.plains.map { p =>
      compileMExpr(df, p.expr).fold(err => return Left(err),
        { case (c, _) => c.as(p.alias) })
    }
    val hiddenCols = hidden.filter(df.columns.contains)
      .map(h => col(s"`$h`").as(h))
    if (st.aggs.isEmpty) {
      Right(df.select(plainCols ++ hiddenCols: _*))
    } else {
      val aggCols = st.aggs.map(a =>
        compileAgg(df, a).fold(err => return Left(err), identity))
      val out =
        if (plainCols.isEmpty && hiddenCols.isEmpty)
          df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(plainCols ++ hiddenCols: _*)
          .agg(aggCols.head, aggCols.tail: _*)
      // restore the declared item order (groupBy put keys first)
      val declared = st.items.map(i => col(s"`${i.alias}`")) ++
        hidden.filter(df.columns.contains).map(h => col(s"`$h`"))
      Right(out.select(declared: _*))
    }
  }

  // ---- the staged runner ---------------------------------------------------

  private val NodeVarRe = """\(\s*([A-Za-z_][A-Za-z0-9_]*)""".r

  def run(edgeFrame: DataFrame, nodeProps: Option[DataFrame],
          cypher: String): Either[String, DataFrame] = {
    val sq = parseStaged(cypher).fold(e => return Left(e), identity)
    // probe parse: learn the pattern's node/edge variables (the head is
    // re-parsed below with the full synthesized projection)
    val probeVar = NodeVarRe.findFirstMatchIn(sq.head)
      .map(_.group(1)).getOrElse(return Left("no pattern variable found"))
    val probe = CypherLite.parse(sq.head + " RETURN " + probeVar)
      .fold(e => return Left(e), identity)
    val nodeVars = (probe.parts ++ probe.optParts)
      .flatMap(_.nodes.map(_.v)).toSet
    val edgeVars = probe.edgeVars
    val patternVars = nodeVars ++ edgeVars
    val allStages = sq.stages :+ sq.ret

    // ---- mid-pipeline MATCH blocks: probe each block's pattern vars
    // (they become live for LATER stages; varIntro records where each
    // variable enters the pipeline — 0 = the head MATCH)
    val varIntro = scala.collection.mutable.Map.empty[String, Int]
    patternVars.foreach(v => varIntro(v) = 0)
    val blockInfo: Map[Int, (Boolean, String, Set[String], Set[String])] =
      allStages.zipWithIndex.flatMap { case (st, idx) =>
        st.matchBlock.map { case (opt, text) =>
          val stageAliases = st.items.map(_.alias).toSet
          val bv = NodeVarRe.findFirstMatchIn(text).map(_.group(1))
            .orElse(stageAliases.headOption)
            .getOrElse(return Left("no pattern variable in the MATCH " +
              s"block of stage ${idx + 1}"))
          val bp = CypherLite.parse("MATCH " + text + " RETURN " + bv,
              extraKnown = stageAliases)
            .fold(e => return Left(s"stage ${idx + 1} MATCH: $e"),
              identity)
          (idx + 1) -> ((opt, text,
            (bp.parts ++ bp.optParts).flatMap(_.nodes.map(_.v)).toSet,
            bp.edgeVars))
        }
      }.toMap

    // ---- reference analysis: which pattern properties do stages read,
    // and how far do they travel? live = vars still passing through bare.
    var live: Set[String] = patternVars
    val needsProp = scala.collection.mutable.Map.empty[(String, String), Int]
    val bareNeeded = scala.collection.mutable.Set.empty[String]
    allStages.zipWithIndex.foreach { case (st, idx) =>
      val k = idx + 1
      val exprs = st.items.flatMap {
        case PlainItem(e, _, _) => Seq(e)
        case AggStageItem(_, arg, _, _) => arg.toSeq
      }
      def walk(e: MExpr): Unit = e match {
        case MExpr.Ref(b, p) if live.contains(b) =>
          if (k == 1) bareNeeded += b
          p match {
            case Seq() | Seq("id") => if (k > 1) () // binding rides as col
            case Seq(prop) =>
              needsProp((b, prop)) =
                math.max(needsProp.getOrElse((b, prop), 0), k)
            case more =>
              throw StagedRefused(s"'$b.${more.mkString(".")}': pattern " +
                "variables carry flat properties — multi-level paths " +
                "apply to map outputs of earlier WITH stages")
          }
        case MExpr.Fn("properties", Seq(MExpr.Ref(b, Seq())))
          if live.contains(b) =>
          if (k == 1) bareNeeded += b
          needsProp((b, "*")) = math.max(needsProp.getOrElse((b, "*"), 0), k)
        case MExpr.MapProj(b, fields) => fields.foreach { f =>
          walk(if (f == "*") MExpr.Fn("properties", Seq(MExpr.Ref(b, Nil)))
               else MExpr.Ref(b, Seq(f)))
        }
        case MExpr.Fn("id" | "labels" | "type",
            Seq(MExpr.Ref(b, Seq()))) =>
          walk(MExpr.Ref(b, Nil))
        case MExpr.Fn(_, args) => args.foreach(walk)
        case MExpr.Bin(_, l, r) => walk(l); walk(r)
        case MExpr.MapLit(es) => es.foreach(x => walk(x._2))
        case MExpr.ListLit(is) => is.foreach(walk)
        case _ =>
      }
      try exprs.foreach(walk)
      catch { case StagedRefused(msg) => return Left(msg) }
      val newLive = st.items.collect {
        case PlainItem(MExpr.Ref(v, Seq()), a, _)
          if a == v && live.contains(v) => v
      }.toSet
      // the stage's WHERE / ORDER BY read its OUTPUT frame — a pattern
      // property referenced there must survive INTO this stage's output,
      // i.e. behaves like a stage-(k+1) input reference over the new
      // live set
      val tailRefs: Seq[MExpr] =
        st.where.flatten.flatMap { case (l, _, r) => Seq(l, r) } ++
          st.orderBy.map { case (path, _) =>
            MExpr.Ref(path.head, path.tail) }
      def walkTail(e: MExpr): Unit = e match {
        case MExpr.Ref(b, Seq(prop)) if newLive.contains(b) &&
          prop != "id" =>
          needsProp((b, prop)) =
            math.max(needsProp.getOrElse((b, prop), 0), k + 1)
        case MExpr.MapProj(b, fields) => fields.foreach { f =>
          walkTail(if (f == "*")
            MExpr.Fn("properties", Seq(MExpr.Ref(b, Nil)))
          else MExpr.Ref(b, Seq(f)))
        }
        case MExpr.Fn(_, args) => args.foreach(walkTail)
        case MExpr.Bin(_, l, r) => walkTail(l); walkTail(r)
        case MExpr.MapLit(es) => es.foreach(x => walkTail(x._2))
        case MExpr.ListLit(is) => is.foreach(walkTail)
        case _ =>
      }
      tailRefs.foreach(walkTail)
      live = newLive
      blockInfo.get(k).foreach { case (_, _, nvs, evs) =>
        live = live ++ nvs ++ evs
        (nvs ++ evs).foreach(v =>
          if (!varIntro.contains(v)) varIntro(v) = k)
      }
    }

    // ---- synthesize the stage-0 projection and compile the MATCH block
    val allNodeProps: Seq[String] =
      nodeProps.map(_.columns.filter(_ != "id").toSeq.sorted).getOrElse(Nil)
    val edgeExtraCols: Seq[String] =
      (edgeFrame.columns.toSet -- Set("src", "dst", "label")).toSeq.sorted
    def starExpansion(v: String): Seq[String] =
      if (edgeVars.contains(v)) edgeExtraCols else allNodeProps
    val propPairs: Seq[(String, String)] = needsProp.keys.toSeq
      .flatMap { case (v, p) =>
        if (p == "*") starExpansion(v).map(v -> _) else Seq(v -> p)
      }.distinct.sorted
    if (needsProp.keys.exists { case (v, p) =>
        p == "*" && starExpansion(v).isEmpty })
      return Left("properties(...) needs a store with property columns " +
        "— supply a nodeProps frame (or, for a relationship variable, " +
        "an edge frame with extra columns)")
    // only head-introduced variables can appear in the stage-0
    // projection; mid-MATCH variables enter through their own block's
    // synthesized RETURN (compileMidMatch)
    def introOf(v: String): Int = varIntro.getOrElse(v, 0)
    val propPairs0 = propPairs.filter(p => introOf(p._1) == 0)
    val bareVars =
      (bareNeeded.toSeq ++ propPairs0.map(_._1) ++
        needsProp.keys.map(_._1).filter(introOf(_) == 0)).distinct.sorted
    val synthesized =
      (bareVars ++ propPairs0.map { case (v, p) => s"$v.$p" }).distinct
    if (synthesized.isEmpty)
      return Left("the first WITH stage references no pattern variable")
    val q0 = CypherLite.parse(sq.head + " RETURN " + synthesized.mkString(", "))
      .fold(e => return Left(e), identity)
    CypherLite.schemaCheck(q0, nodeProps, edgeFrame)
      .fold(e => return Left(e), identity)
    var df = CypherLite.compile(edgeFrame, q0,
      if (q0.neededProps.nonEmpty) nodeProps else None)

    // ---- fold the stages (each = one select / one groupBy-agg, then
    // its Cypher clause tail: ORDER BY + LIMIT, then WHERE)
    var liveNow: Set[String] = patternVars
    allStages.zipWithIndex.foreach { case (st, idx) =>
      val k = idx + 1
      val passThrough = st.items.collect {
        case PlainItem(MExpr.Ref(v, Seq()), a, _)
          if a == v && liveNow.contains(v) => v
      }.toSet
      val hidden: Seq[String] = propPairs.collect {
        case (v, p) if passThrough.contains(v) &&
          (needsProp.getOrElse((v, p), 0) > k ||
            needsProp.getOrElse((v, "*"), 0) > k) => s"$v.$p"
      }
      df = compileStageFrame(df, st, hidden)
        .fold(e => return Left(s"stage $k: $e"), identity)
      if (st.distinct) df = df.distinct()
      if (st.orderBy.nonEmpty) {
        val ordCols = st.orderBy.map { case (path, asc) =>
          val c = resolveRef(df, path.head, path.tail)
            .fold(e => return Left(s"stage $k ORDER BY: $e"), _._1)
          if (asc) c.asc else c.desc
        }
        df = df.orderBy(ordCols: _*)
      }
      st.skip.foreach(n => df = df.offset(n))
      st.limit.foreach(n => df = df.limit(n))
      if (st.where.nonEmpty) {
        def cmp(t: (MExpr, String, MExpr)): Column = {
          val (lc, lk) = compileMExpr(df, t._1)
            .fold(e => throw StagedRefused(s"stage $k WHERE: $e"), identity)
          val (rc, rk) = compileMExpr(df, t._3)
            .fold(e => throw StagedRefused(s"stage $k WHERE: $e"), identity)
          val numeric = Set(lk, rk).exists(Set("int", "num").contains)
          val (a, b) =
            if (numeric) (lc.try_cast("double"), rc.try_cast("double"))
            else (lc, rc)
          t._2 match {
            case "=" => a === b
            case "<>" => a =!= b
            case ">" => a > b
            case ">=" => a >= b
            case "<" => a < b
            case "<=" => a <= b
          }
        }
        try df = df.filter(
          st.where.map(_.map(cmp).reduce(_ && _)).reduce(_ || _))
        catch { case StagedRefused(msg) => return Left(msg) }
      }
      liveNow = passThrough
      blockInfo.get(k).foreach { case (optional, text, nvs, evs) =>
        val blockProps = propPairs.filter { case (v, _) => introOf(v) == k }
        df = compileMidMatch(edgeFrame, nodeProps, df, text, optional,
            nvs, evs, blockProps)
          .fold(e => return Left(s"stage $k MATCH: $e"), identity)
        liveNow = liveNow ++ nvs ++ evs
      }
    }
    // Hidden pass-through property columns may survive the RETURN stage
    // when its ORDER BY referenced a pattern property outside the
    // projection (walkTail records needsProp at N+1) — Cypher returns
    // only the declared items, so re-select them
    val declaredOut = sq.ret.items.map(_.alias)
    if (df.columns.toSeq != declaredOut)
      df = df.select(declaredOut.map(a => col(s"`$a`")): _*)
    Right(df)
  }

  /** Expand the running stage frame through a mid-pipeline
    * `[OPTIONAL] MATCH` block (the reference's entity_vss_provider /
    * entity_from_top_statement shapes). Mandatory blocks compile as a
    * full query PIPED on the current frame (shared variable names are
    * the join keys — CypherLite.compile's WITH-pipe machinery);
    * OPTIONAL blocks compile standalone (labels, anchors and the
    * block's own WHERE apply INSIDE the pattern, Cypher's semantics)
    * and LEFT-join back on the shared variables, so unmatched rows
    * survive with nulls and `count(r)` over them is 0. The synthesized
    * RETURN carries every current column plus the block's new variables
    * and any of their properties later stages read. */
  private def compileMidMatch(edgeFrame: DataFrame,
                              nodeProps: Option[DataFrame],
                              df: DataFrame, text: String,
                              optional: Boolean,
                              blockNodeVars: Set[String],
                              blockEdgeVars: Set[String],
                              props: Seq[(String, String)])
  : Either[String, DataFrame] = {
    val pipedCols = df.columns.toSeq
    val IdentCol = """[A-Za-z_][A-Za-z0-9_]*""".r
    val DottedCol = """[A-Za-z_][A-Za-z0-9_]*\.[A-Za-z_][A-Za-z0-9_]*""".r
    pipedCols.find(c => !IdentCol.matches(c) && !DottedCol.matches(c))
      .foreach(c => return Left(s"column '$c' cannot cross a MATCH " +
        "stage — alias it with AS in the preceding WITH"))
    val shared = blockNodeVars & pipedCols.toSet
    if (shared.isEmpty)
      return Left("the MATCH after a WITH stage shares no variable " +
        s"with the stage outputs (have: ${pipedCols.mkString(", ")}) — " +
        "that would be a cartesian expansion; anchor a pattern variable " +
        "on a stage output")
    val retNew =
      (blockNodeVars ++ blockEdgeVars).toSeq.sorted
        .filterNot(pipedCols.contains)
        .filterNot(_.startsWith("__a")) ++ // anonymous nodes stay hidden
        props.map { case (v, p) => s"$v.$p" }.distinct
          .filterNot(pipedCols.contains)
    if (optional) {
      val q = CypherLite.parse("MATCH " + text + " RETURN " +
          (shared.toSeq.sorted ++ retNew).distinct.mkString(", "))
        .fold(e => return Left(e), identity)
      CypherLite.schemaCheck(q, nodeProps, edgeFrame)
        .fold(e => return Left(e), identity)
      val f = CypherLite.compile(edgeFrame, q,
        if (q.neededProps.nonEmpty) nodeProps else None)
      Right(df.join(f, shared.toSeq.sorted, "left"))
    } else {
      val q = CypherLite.parse("MATCH " + text + " RETURN " +
          (pipedCols ++ retNew).distinct.mkString(", "),
          extraKnown = pipedCols.toSet)
        .fold(e => return Left(e), identity)
      CypherLite.schemaCheck(q, nodeProps, edgeFrame)
        .fold(e => return Left(e), identity)
      Right(CypherLite.compile(edgeFrame, q,
        if (q.neededProps.nonEmpty) nodeProps else None,
        piped = Some(df)))
    }
  }

  private final case class StagedRefused(msg: String)
    extends RuntimeException(msg)
}
