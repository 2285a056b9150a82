package graft.protocols

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.pipeline.LexicalGraphQueryEngine
import org.apache.spark.sql.functions._

/** The reference's MCP serving surface re-expressed over the Spark
  * engine (protocols/mcp_server.py:1-277): each tenant's lexical graph
  * becomes ONE tool whose description is that graph's summary, calls
  * route to the query engine's `retrieve`/`query` methods, and a
  * `search_` tool maps a search term to the tenant tools whose graphs
  * know it (the reference's label-prefix probe becomes an entity
  * `search_str` prefix scan). The transport is MCP's stdio framing —
  * newline-delimited JSON-RPC 2.0 — with the `initialize` /
  * `tools/list` / `tools/call` method subset an MCP client drives;
  * [[graft.tools.McpServe]] is the stdio loop, and the scripted
  * request/response fixture lives in McpServerSpec.
  *
  * Serving-tier parity only: every answer comes from the SAME
  * `LexicalGraphQueryEngine.answer`/`query` the q_full_chain gates
  * exercise — this class adds routing and JSON, no query semantics.
  * Jackson (Spark's own classpath) does the JSON; no extra dependency.
  */
final class McpServer(
    tenants: Seq[(String, LexicalGraphQueryEngine, String)]) {

  private val mapper = new ObjectMapper
  private val byName: Map[String, (LexicalGraphQueryEngine, String)] =
    tenants.map { case (n, e, d) => n -> (e, d) }.toMap

  /** Handle one JSON-RPC 2.0 request line → one response line (JSON).
    * Never throws: malformed input and handler failures become JSON-RPC
    * error objects (the serving loop must survive bad clients). */
  def handle(line: String): String = {
    val req: JsonNode =
      try mapper.readTree(line)
      catch { case e: Exception =>
        return err(null, -32700, s"parse error: ${e.getMessage}") }
    val id = req.get("id")
    try {
      req.path("method").asText() match {
        case "initialize" =>
          val r = mapper.createObjectNode()
          r.put("protocolVersion", "2024-11-05")
          r.set[ObjectNode]("serverInfo", {
            val si = mapper.createObjectNode()
            si.put("name", "LexicalGraphServer")
            si.put("version", "1.0")
            si
          })
          r.set[ObjectNode]("capabilities", {
            val c = mapper.createObjectNode()
            c.set[ObjectNode]("tools", mapper.createObjectNode())
            c
          })
          ok(id, r)
        case "notifications/initialized" => "" // notification — no reply
        case "tools/list" =>
          val r = mapper.createObjectNode()
          val arr = r.putArray("tools")
          tenants.foreach { case (name, _, summary) =>
            arr.add(toolDef(name, summary,
              Seq(("query", "A natural language query"),
                ("query_method", "retrieve | query"))))
          }
          arr.add(toolDef("search_",
            "Given a search term, returns the name of one or more " +
              "tools that can be used to provide information about the " +
              "search term.",
            Seq(("search_term",
              "Entity, concept or phrase for which one or more tools " +
                "are to be found"))))
          ok(id, r)
        case "tools/call" =>
          val params = req.path("params")
          val name = params.path("name").asText()
          val args = params.path("arguments")
          val texts: Seq[String] =
            if (name == "search_") searchTool(args.path("search_term").asText())
            else byName.get(name) match {
              case None => return err(id, -32602, s"unknown tool '$name'")
              case Some((engine, _)) =>
                val query = args.path("query").asText()
                if (query.isEmpty)
                  return err(id, -32602, "missing 'query' argument")
                args.path("query_method").asText("retrieve") match {
                  case "query" => Seq(engine.answer(query).response)
                  case _ =>
                    // the reference's retrieve path: result rows as
                    // JSON texts (mcp_server.py:146-148)
                    engine.query(query).toJSON.collect().toSeq
                }
            }
          val r = mapper.createObjectNode()
          val content = r.putArray("content")
          texts.foreach { t =>
            val c = mapper.createObjectNode()
            c.put("type", "text"); c.put("text", t)
            content.add(c)
          }
          r.put("isError", false)
          ok(id, r)
        case other => err(id, -32601, s"method not found: '$other'")
      }
    } catch {
      case e: Exception => err(id, -32603, s"internal: ${e.getMessage}")
    }
  }

  /** The reference's tool_search (mcp_server.py:73-106): tenants whose
    * entity table knows the term by search_str prefix. */
  private def searchTool(term: String): Seq[String] =
    tenants.collect { case (name, engine, _)
      if engine.graph.entities
        .filter(col("search_str").startsWith(term.toLowerCase))
        .limit(1).count() > 0 => name
    }

  private def toolDef(name: String, description: String,
                      args: Seq[(String, String)]): ObjectNode = {
    val t = mapper.createObjectNode()
    t.put("name", name)
    t.put("description", description)
    val schema = t.putObject("inputSchema")
    schema.put("type", "object")
    val props = schema.putObject("properties")
    args.foreach { case (an, ad) =>
      val p = props.putObject(an)
      p.put("type", "string"); p.put("description", ad)
    }
    val reqd = schema.putArray("required")
    args.headOption.foreach(a => reqd.add(a._1))
    t
  }

  private def ok(id: JsonNode, result: ObjectNode): String = {
    val r = mapper.createObjectNode()
    r.put("jsonrpc", "2.0")
    if (id != null) r.set[JsonNode]("id", id) else r.putNull("id")
    r.set[ObjectNode]("result", result)
    mapper.writeValueAsString(r)
  }

  private def err(id: JsonNode, code: Int, message: String): String = {
    val r = mapper.createObjectNode()
    r.put("jsonrpc", "2.0")
    if (id != null) r.set[JsonNode]("id", id) else r.putNull("id")
    val e = r.putObject("error")
    e.put("code", code); e.put("message", message)
    mapper.writeValueAsString(r)
  }
}
