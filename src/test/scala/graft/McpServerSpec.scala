package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.protocols.McpServer
import org.apache.spark.sql.functions._

/** Scripted request/response fixture for the MCP-analogue serving
  * surface (reference protocols/mcp_server.py): the stdio method subset
  * (initialize / tools/list / tools/call), tenant tools backed by the
  * oracle-gated query engine, the search_ tool's tenant routing, and
  * the error contract (unknown method/tool, parse error — the loop must
  * answer, never throw). */
class McpServerSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper

  private lazy val server: McpServer = {
    val docs = Seq(
      (1L, "alice corp acquired bob industries in 2020", "en", "news"),
      (2L, "bob industries builds solar panels in nevada", "en", "news"),
      (3L, "alice corp reported record revenue for 2021", "en", "wire"))
      .toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"),
        col("lang"), col("source"))
    val engine = graft.pipeline.LexicalGraphQueryEngine.fromDocuments(
      spark, docs, "text", Seq("lang", "source"))
    val summary = graft.retrieve.GraphSummary.summarize(
      engine.graph, new graft.llm.StubLLM, k = 10)
    new McpServer(Seq(("t0", engine, summary)))
  }

  private def call(req: String) = mapper.readTree(server.handle(req))

  test("initialize answers the MCP handshake with tool capabilities") {
    val r = call("""{"jsonrpc":"2.0","id":1,"method":"initialize"}""")
    assert(r.path("id").asInt() == 1)
    assert(r.path("result").path("serverInfo").path("name").asText() ==
      "LexicalGraphServer")
    assert(r.path("result").path("capabilities").has("tools"))
    // the initialized notification gets no reply (MCP notification rule)
    assert(server.handle(
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""") == "")
  }

  test("tools/list exposes one tool per tenant (description = the graph " +
    "summary) plus search_") {
    val r = call("""{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
    val tools = r.path("result").path("tools")
    val names = (0 until tools.size()).map(tools.get(_).path("name").asText())
    assert(names == Seq("t0", "search_"))
    assert(tools.get(0).path("description").asText().nonEmpty)
    assert(tools.get(0).path("inputSchema").path("properties").has("query"))
  }

  test("tools/call retrieve returns result rows as JSON texts; query " +
    "returns the engine answer") {
    val r = call("""{"jsonrpc":"2.0","id":3,"method":"tools/call",
      "params":{"name":"t0","arguments":{
        "query":"what did alice corp do","query_method":"retrieve"}}}""")
    val content = r.path("result").path("content")
    assert(content.size() > 0, r.toString)
    val row = mapper.readTree(content.get(0).path("text").asText())
    assert(row.has("statement"), row.toString)
    val a = call("""{"jsonrpc":"2.0","id":4,"method":"tools/call",
      "params":{"name":"t0","arguments":{
        "query":"what did alice corp do","query_method":"query"}}}""")
    val ac = a.path("result").path("content")
    assert(ac.size() == 1 && ac.get(0).path("text").asText().nonEmpty)
  }

  test("search_ routes a known term to its tenant tool and an unknown " +
    "term to none") {
    val hit = call("""{"jsonrpc":"2.0","id":5,"method":"tools/call",
      "params":{"name":"search_","arguments":{"search_term":"Alice"}}}""")
    val texts = hit.path("result").path("content")
    assert((0 until texts.size()).map(
      texts.get(_).path("text").asText()) == Seq("t0"))
    val miss = call("""{"jsonrpc":"2.0","id":6,"method":"tools/call",
      "params":{"name":"search_","arguments":{
        "search_term":"zzzznotathing"}}}""")
    assert(miss.path("result").path("content").size() == 0)
  }

  test("errors are JSON-RPC error objects, never thrown: unknown " +
    "method, unknown tool, missing query, parse error") {
    assert(call("""{"jsonrpc":"2.0","id":7,"method":"resources/list"}""")
      .path("error").path("code").asInt() == -32601)
    assert(call("""{"jsonrpc":"2.0","id":8,"method":"tools/call",
      "params":{"name":"nope","arguments":{"query":"x"}}}""")
      .path("error").path("code").asInt() == -32602)
    assert(call("""{"jsonrpc":"2.0","id":9,"method":"tools/call",
      "params":{"name":"t0","arguments":{}}}""")
      .path("error").path("code").asInt() == -32602)
    assert(call("""{not json""").path("error").path("code").asInt()
      == -32700)
  }
}
