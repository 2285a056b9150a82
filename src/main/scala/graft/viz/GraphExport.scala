package graft.viz

import graft.index.GraphTables
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Graph visualisation export — the Spark-native analogue of the
  * reference's notebook renderer (visualisation/graph_notebook/
  * graph_notebook_visualisation.py, ~589 LoC): where the reference
  * issues subgraph cypher around retrieval results and hands the rows
  * to graph-notebook, this module extracts the SAME subgraphs from the
  * lexical graph tables as (nodes, edges) frames and renders them as
  * GraphML or DOT text for Gephi/yEd/graphviz.
  *
  * Subgraph builders mirror the reference's query shapes:
  *  - [[statementNeighborhood]] — get_query (graph_notebook_
  *    visualisation.py:99-137): sources ← chunks ← topics ← statements
  *    ← facts ← entities, restricted to a statement-id set (the rows a
  *    retrieval round returned);
  *  - [[entityContext]] — get_entity_context_query (:139-153): a set of
  *    entities and the RELATION edges among them;
  *  - [[entityPaths]] — get_entity_paths_query (:194-212): RELATION
  *    paths of bounded depth from one entity (optionally to another) —
  *    executed through the SAME CypherPaths/CypherLite var-length
  *    machinery the retrieval gates use;
  *  - [[schema]] — get_schema_query (:155-169): the label-pair graph.
  *
  * Rendering is inherently driver-side (a picture is small by
  * definition), so both renderers take a hard `maxNodes` cap and refuse
  * loudly above it — the subgraph builders are plain bounded DataFrame
  * programs until then, and the cap is checked BEFORE any collect. */
object GraphExport {

  final case class Subgraph(nodes: DataFrame, edges: DataFrame)

  /** sources←chunks←topics←statements←facts←entities around a
    * statement-id set (the reference's include_sources=True shape). */
  def statementNeighborhood(g: GraphTables,
                            statementIds: Seq[String]): Subgraph = {
    val spark = g.statements.sparkSession
    import spark.implicits._
    val sids = statementIds.toDF("statement_id")
    val stmts = g.statements.join(broadcast(sids), "statement_id")
    val fsp = g.factSupports.join(broadcast(sids), "statement_id")
    val facts = g.facts.join(fsp.select("fact_id").distinct(), "fact_id")
    val chunks = g.chunks.join(
      stmts.select("chunk_id").distinct(), "chunk_id")
    val topics = g.topics.join(
      stmts.select("topic_id").distinct(), "topic_id")
    val sources = g.sources.join(
      chunks.select("source_id").distinct(), "source_id")
    def n(df: DataFrame, id: String, value: String,
          cls: String): DataFrame =
      df.select(col(id).as("id"), col(value).cast("string").as("value"),
        lit(cls).as("class"))
    val nodes =
      n(sources, "source_id", "source_id", "source")
        .union(n(chunks, "chunk_id", "chunk_id", "chunk"))
        .union(n(topics, "topic_id", "value", "topic"))
        .union(n(stmts, "statement_id", "value", "statement"))
        .union(n(facts, "fact_id", "value", "fact"))
        .union(n(g.entities.join(
          facts.select(explode(array(col("subject_entity_id"),
            col("object_entity_id"))).as("entity_id")).distinct(),
          "entity_id"), "entity_id", "value", "entity"))
        .distinct()
    def e(df: DataFrame, a: String, b: String, label: String): DataFrame =
      df.select(col(a).as("src"), col(b).as("dst"),
        lit(label).as("label")).distinct()
    val edges =
      e(chunks, "chunk_id", "source_id", "extracted_from")
        .union(e(stmts, "topic_id", "chunk_id", "mentioned_in"))
        .union(e(stmts, "statement_id", "topic_id", "belongs_to"))
        .union(e(stmts, "statement_id", "chunk_id", "mentioned_in"))
        .union(e(fsp, "fact_id", "statement_id", "supports"))
        .union(e(facts, "subject_entity_id", "fact_id", "subject"))
        .union(e(facts.filter(col("object_entity_id").isNotNull),
          "object_entity_id", "fact_id", "object"))
    Subgraph(nodes, edges)
  }

  /** A set of entities + the RELATION edges among them (the entity
    * context view). */
  def entityContext(g: GraphTables, entityIds: Seq[String]): Subgraph = {
    val spark = g.entities.sparkSession
    import spark.implicits._
    val ids = entityIds.toDF("entity_id")
    val nodes = g.entities.join(broadcast(ids), "entity_id")
      .select(col("entity_id").as("id"),
        col("value").cast("string").as("value"), lit("entity").as("class"))
    val edges = g.entityRelations
      .join(broadcast(ids.select(col("entity_id").as("src_entity_id"))),
        "src_entity_id")
      .join(broadcast(ids.select(col("entity_id").as("dst_entity_id"))),
        "dst_entity_id")
      .select(col("src_entity_id").as("src"),
        col("dst_entity_id").as("dst"),
        coalesce(col("relation_value").cast("string"), lit("relation"))
          .as("label"))
      .distinct()
    Subgraph(nodes, edges)
  }

  /** RELATION paths of depth 1..`depth` from `e1` (optionally only the
    * ones reaching `e2`) — the reference's entity-paths picture, run
    * through the retrieval dialect itself: the same `p=` path binding /
    * nodes(p) machinery q_cypher_pathsearch gates. Returns the node-id
    * frame plus the RELATION edges among those nodes. */
  def entityPaths(g: GraphTables, e1: String, e2: Option[String],
                  depth: Int = 2): Subgraph = {
    require(depth >= 1 && depth <= graft.byokg.CypherLite.MaxVarHops,
      s"depth must be 1..${graft.byokg.CypherLite.MaxVarHops}")
    val rel = g.entityRelations.select(
      col("src_entity_id").as("src"), col("dst_entity_id").as("dst"),
      lit("relation").as("label"))
    val where = e2.fold("")(x => s" WHERE e2.id in ['$x']")
    val text =
      s"MATCH p=(e1 {id: '$e1'})-[:relation*1..$depth]-(e2)$where " +
        "UNWIND nodes(p) AS n WITH DISTINCT COLLECT(n) AS xs " +
        "MATCH (s)-[:relation]->(o) WHERE s in xs AND o in xs " +
        "RETURN DISTINCT s.id AS src, o.id AS dst"
    val onPath = graft.byokg.CypherLite.run(rel, None, text)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val ids = onPath.select(col("src").as("entity_id"))
      .union(onPath.select(col("dst"))).distinct()
    val nodes = g.entities.join(ids, "entity_id")
      .select(col("entity_id").as("id"),
        col("value").cast("string").as("value"), lit("entity").as("class"))
    Subgraph(nodes, onPath.withColumn("label", lit("relation")))
  }

  /** The label-pair schema graph (class → class per relation label). */
  def schema(edges: DataFrame): Subgraph = {
    val tri = edges.select(
        substring_index(col("src"), ":", 1).as("src"),
        substring_index(col("dst"), ":", 1).as("dst"), col("label"))
      .distinct()
    val nodes = tri.select(col("src").as("id"))
      .union(tri.select(col("dst"))).distinct()
      .select(col("id"), col("id").as("value"), lit("label").as("class"))
    Subgraph(nodes, tri)
  }

  private def xmlEscape(s: String): String =
    Option(s).getOrElse("").replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  private def collectCapped(sg: Subgraph, maxNodes: Int)
  : (Seq[(String, String, String)], Seq[(String, String, String)]) = {
    val nNodes = sg.nodes.count()
    require(nNodes <= maxNodes,
      s"subgraph has $nNodes nodes, over the $maxNodes render cap — " +
        "narrow the selection (a picture this size is unreadable anyway)")
    val ns = sg.nodes.orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val known = ns.map(_._1).toSet
    val es = sg.edges.orderBy("src", "dst", "label").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      .filter(e => known.contains(e._1) && known.contains(e._2))
    (ns, es)
  }

  /** GraphML rendering (yEd/Gephi-readable; value + class as node
    * data keys, label as edge data key). */
  def toGraphML(sg: Subgraph, maxNodes: Int = 2000): String = {
    val (ns, es) = collectCapped(sg, maxNodes)
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
    sb ++= "  <key id=\"value\" for=\"node\" attr.name=\"value\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"class\" for=\"node\" attr.name=\"class\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"label\" for=\"edge\" attr.name=\"label\" attr.type=\"string\"/>\n"
    sb ++= "  <graph id=\"G\" edgedefault=\"directed\">\n"
    ns.foreach { case (id, value, cls) =>
      sb ++= s"""    <node id="${xmlEscape(id)}">\n"""
      sb ++= s"""      <data key="value">${xmlEscape(value)}</data>\n"""
      sb ++= s"""      <data key="class">${xmlEscape(cls)}</data>\n"""
      sb ++= "    </node>\n"
    }
    es.zipWithIndex.foreach { case ((s0, d, l), i) =>
      sb ++= s"""    <edge id="e$i" source="${xmlEscape(s0)}" """ +
        s"""target="${xmlEscape(d)}">\n"""
      sb ++= s"""      <data key="label">${xmlEscape(l)}</data>\n"""
      sb ++= "    </edge>\n"
    }
    sb ++= "  </graph>\n</graphml>\n"
    sb.toString
  }

  private def dotEscape(s: String): String =
    Option(s).getOrElse("").replace("\\", "\\\\").replace("\"", "\\\"")

  /** DOT rendering (graphviz; class becomes the node shape family). */
  def toDot(sg: Subgraph, maxNodes: Int = 2000): String = {
    val (ns, es) = collectCapped(sg, maxNodes)
    val sb = new StringBuilder
    sb ++= "digraph G {\n  node [style=filled];\n"
    val palette = Map("source" -> "lightblue", "chunk" -> "lightgrey",
      "topic" -> "gold", "statement" -> "palegreen", "fact" -> "pink",
      "entity" -> "orange", "label" -> "white")
    ns.foreach { case (id, value, cls) =>
      val color = palette.getOrElse(cls, "white")
      sb ++= s"""  "${dotEscape(id)}" [label="${dotEscape(value)}" """ +
        s"""fillcolor=$color];\n"""
    }
    es.foreach { case (s0, d, l) =>
      sb ++= s"""  "${dotEscape(s0)}" -> "${dotEscape(d)}" """ +
        s"""[label="${dotEscape(l)}"];\n"""
    }
    sb ++= "}\n"
    sb.toString
  }
}
