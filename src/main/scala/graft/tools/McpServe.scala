package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stdio serving loop for [[graft.protocols.McpServer]] — the MCP
  * transport shape (newline-delimited JSON-RPC over stdin/stdout, logs
  * on stderr, exactly how the reference's FastMCP stdio server runs):
  *
  * {{{
  * sbt "runMain graft.tools.McpServe /root/testdata/sf0.001"
  * {"jsonrpc":"2.0","id":1,"method":"initialize"}
  * {"jsonrpc":"2.0","id":2,"method":"tools/list"}
  * {"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"t0",
  *   "arguments":{"query":"...", "query_method":"query"}}}
  * }}}
  *
  * Builds one tenant engine over the documents table with the graph
  * summary as the tool description (the reference registers each tenant
  * the same way, mcp_server.py:219-266). The engine, stub LLM, and
  * summary are the SAME oracle-gated components the batch gates run —
  * this main only adds the wire loop.
  */
object McpServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"),
        col("lang"), col("source"))
    val engine = graft.pipeline.LexicalGraphQueryEngine.fromDocuments(
      spark, docs, "text", Seq("lang", "source"))
    val summary = graft.retrieve.GraphSummary.summarize(
      engine.graph, new graft.llm.StubLLM, k = 20)
    val server = new graft.protocols.McpServer(
      Seq(("t0", engine, summary)))
    System.err.println("[mcp] serving on stdio (newline-delimited " +
      "JSON-RPC); EOF to stop")
    scala.io.Source.stdin.getLines().foreach { line =>
      if (line.trim.nonEmpty) {
        val resp = server.handle(line)
        if (resp.nonEmpty) println(resp)
      }
    }
    spark.stop()
  }
}
