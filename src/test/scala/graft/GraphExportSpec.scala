package graft

import graft.viz.GraphExport
import org.apache.spark.sql.functions._

/** Visualisation-export gates: the subgraph builders mirror the
  * reference's notebook query shapes and the renderers emit well-formed
  * GraphML/DOT with hard caps (rendering is driver-side by nature — the
  * cap must refuse before any collect). */
class GraphExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val engine = {
    val docs = Seq(
      (1L, "alice corp acquired bob industries in 2020", "en", "news"),
      (2L, "bob industries builds solar panels in nevada", "en", "news"),
      (3L, "alice corp reported record revenue for 2021", "en", "wire"))
      .toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"),
        col("lang"), col("source"))
    graft.pipeline.LexicalGraphQueryEngine.fromDocuments(
      spark, docs, "text", Seq("lang", "source"))
  }
  private lazy val g = engine.graph

  test("statementNeighborhood extracts the sources-chunks-topics-" +
    "statements-facts-entities subgraph around a statement set") {
    val sids = g.statements.select("statement_id").limit(2)
      .collect().map(_.getString(0)).toSeq
    val sg = GraphExport.statementNeighborhood(g, sids)
    val classes = sg.nodes.select("class").distinct()
      .collect().map(_.getString(0)).toSet
    assert(classes.contains("statement") && classes.contains("source") &&
      classes.contains("entity"), classes.toString)
    // every edge endpoint resolves to a node (after the render filter)
    val ml = GraphExport.toGraphML(sg)
    assert(ml.contains("<graphml") && ml.contains("</graphml>"))
    assert(ml.split("<node ").length > 3 && ml.split("<edge ").length > 3)
  }

  test("entityContext keeps only the requested entities and the " +
    "relations among them") {
    val ids = g.entities.select("entity_id").orderBy("entity_id")
      .collect().map(_.getString(0)).toSeq
    val sg = GraphExport.entityContext(g, ids)
    assert(sg.nodes.count() == ids.size)
    val dot = GraphExport.toDot(sg)
    assert(dot.startsWith("digraph G {") && dot.endsWith("}\n"))
    // edges are entity-to-entity only
    val endpoints = sg.edges.select("src").union(sg.edges.select("dst"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(endpoints.subsetOf(ids.toSet))
  }

  test("entityPaths runs through the retrieval dialect's path-collect " +
    "machinery and returns the on-path relation subgraph") {
    val e1 = g.entityRelations.select("src_entity_id")
      .orderBy("src_entity_id").limit(1).collect().head.getString(0)
    val sg = GraphExport.entityPaths(g, e1, None, depth = 2)
    assert(sg.nodes.count() >= 1)
    assert(sg.edges.columns.toSeq == Seq("src", "dst", "label"))
    // depth outside the dialect's bound refuses
    intercept[IllegalArgumentException] {
      GraphExport.entityPaths(g, e1, None, depth = 9)
    }
  }

  test("schema collapses ids to label pairs") {
    val edges = Seq(("c:1", "o:1", "placed"), ("c:2", "o:9", "placed"),
      ("o:1", "p:3", "contains")).toDF("src", "dst", "label")
    val sg = GraphExport.schema(edges)
    assert(sg.edges.count() == 2)
    assert(sg.nodes.select("id").collect().map(_.getString(0)).toSet ==
      Set("c", "o", "p"))
  }

  test("the render cap refuses loudly before any collect, and escaping " +
    "is XML/DOT safe") {
    val nodes = Seq(("a", "x < \"y\" & z", "entity"),
      ("b", "q\\r", "entity")).toDF("id", "value", "class")
    val edges = Seq(("a", "b", "rel")).toDF("src", "dst", "label")
    val sg = GraphExport.Subgraph(nodes, edges)
    val ml = GraphExport.toGraphML(sg)
    assert(ml.contains("x &lt; &quot;y&quot; &amp; z"))
    val dot = GraphExport.toDot(sg)
    assert(dot.contains("q\\\\r"))
    val ex = intercept[IllegalArgumentException] {
      GraphExport.toDot(sg, maxNodes = 1)
    }
    assert(ex.getMessage.contains("render cap"))
  }
}
