package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Readers

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl and csv readers land on the document contract") {
    val dir = Files.createTempDirectory("readers").toFile
    val jf = new java.io.File(dir, "d.jsonl")
    val jw = new java.io.PrintWriter(jf)
    jw.println("""{"doc_id":1,"text":"hello"}""")
    jw.println("""{"doc_id":2,"text":"world"}""")
    jw.close()
    val jdf = Readers.jsonl(spark, jf.getAbsolutePath)
    assert(jdf.count() == 2 && jdf.columns.toSet == Set("doc_id", "text"))

    val cf = new java.io.File(dir, "d.csv")
    val cw = new java.io.PrintWriter(cf)
    cw.println("doc_id,text"); cw.println("1,alpha"); cw.println("2,beta")
    cw.close()
    val cdf = Readers.csv(spark, cf.getAbsolutePath)
    assert(cdf.count() == 2)
    assert(cdf.select("text").as[String].collect().sorted.toSeq == Seq("alpha", "beta"))
  }

  test("markdownToText strips markup but keeps content") {
    val md = """# Title
      |Some **bold** and _italic_ text with a [link](http://x) and `code`.
      |- item one
      |1. item two
      |```scala
      |ignored()
      |```""".stripMargin
    val out = Seq(md).toDF("md")
      .select(Readers.markdownToText(col("md"))).as[String].head()
    assert(out == "Title Some bold and italic text with a link and code. item one item two")
  }

  test("htmlToText drops tags, scripts, and decodes entities") {
    val html = "<html><head><style>p{}</style></head><body>" +
      "<script>var x=1;</script><p>Tom &amp; Jerry &lt;3</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(Readers.htmlToText(col("h"))).as[String].head()
    assert(out == "Tom & Jerry <3")
  }

  test("jdbc reader round-trips through embedded Derby") {
    val db = Files.createTempDirectory("derby").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE docs (id INT, body VARCHAR(100))")
    st.execute("INSERT INTO docs VALUES (1, 'alpha'), (2, 'beta')")
    st.close(); conn.close()
    val out = Readers.jdbc(spark, s"jdbc:derby:$db",
      "SELECT id, body FROM docs",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(out.orderBy(col("ID")).select("BODY").as[String].collect().toSeq ==
      Seq("alpha", "beta"))
  }

  test("rowsToDocuments verbalizes rows onto the document contract") {
    val df = Seq((1, "alice", 9.5), (2, "bob", 7.0))
      .toDF("id", "name", "score")
    val out = Readers.rowsToDocuments(df, idCols = Seq("id"))
    assert(out.columns.toSeq == Seq("doc_id", "text", "metadata"))
    val row = out.filter(col("doc_id") === "1").head()
    assert(row.getString(1) == "id: 1, name: alice, score: 9.5")
    assert(row.getMap[String, String](2)("name") == "alice")
    // no id columns: deterministic content hash
    val hashed = Readers.rowsToDocuments(df)
    assert(hashed.select("doc_id").distinct().count() == 2)
  }

  test("web reader maps urls through the fetch seam and strips html") {
    val out = Readers.web(spark, Seq("http://a", "http://b"),
      fetch = u => s"<html><script>x()</script><p>page of $u</p></html>")
    val m = out.as[(String, String)].collect().toMap
    assert(m("http://a") == "page of http://a")
    assert(m.size == 2)
    // default fetch fails loudly (no egress here)
    intercept[org.apache.spark.SparkException] {
      Readers.web(spark, Seq("http://x")).collect()
    }
  }

  test("wikipedia/github/youtube readers build urls through their seams") {
    val wiki = Readers.wikipedia(spark, Seq("Apache Spark"),
      fetch = u => s"<p>body of $u</p>")
    assert(wiki.as[(String, String)].collect().toSeq == Seq(
      ("https://en.wikipedia.org/wiki/Apache_Spark",
        "body of https://en.wikipedia.org/wiki/Apache_Spark")))
    val gh = Readers.github(spark, "apache", "spark", "master",
      Seq("README.md"), fetch = u => s"raw: $u")
    assert(gh.as[(String, String)].head() ==
      (("https://raw.githubusercontent.com/apache/spark/master/README.md",
        "raw: https://raw.githubusercontent.com/apache/spark/master/README.md")))
    val yt = Readers.youtube(spark, Seq("abc123"),
      fetchTranscript = v => s"transcript of $v")
    assert(yt.as[(String, String)].head() == (("abc123", "transcript of abc123")))
  }

  /** Committed recorded payload → string (fixtures are tiny; the fetch
    * seam closures capture the payload string, not the classloader). */
  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing test fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("web reader replays a recorded HTML page into clean text") {
    val html = fixture("page.html")
    val out = Readers.web(spark, Seq("https://example.test/docs"),
      fetch = _ => html)
    val (id, text) = out.as[(String, String)].head()
    assert(id == "https://example.test/docs")
    // scripts/styles/tags gone, entities decoded, whitespace collapsed
    assert(text.contains("Joins & Aggregations"))
    assert(text.contains("Use broadcast() for dimensions < 10 MB."))
    assert(text.contains("Shuffle partitions should match cluster cores."))
    // script bodies and markup are gone (the decoded literal '<' from
    // &lt; is CONTENT and stays — decode runs after tag removal)
    assert(!text.contains("should never appear"))
    assert(!text.contains("<p>") && !text.contains("<script") &&
      !text.contains("</"))
  }

  test("wikipediaApi parses the recorded REST summary payload; unresolved " +
    "titles drop") {
    val ok = fixture("wiki_summary_apache_spark.json")
    val miss = fixture("wiki_summary_missing.json")
    val out = Readers.wikipediaApi(spark,
      Seq("Apache Spark", "No Such Page Zzz"),
      fetch = u => if (u.endsWith("Apache_Spark")) ok else miss)
    val rows = out.collect()
    assert(rows.length == 1) // the not-found payload has no extract → drop
    val r = rows.head
    assert(r.getAs[String]("doc_id") == "Apache Spark")
    assert(r.getAs[String]("text").startsWith(
      "Apache Spark is an open-source unified analytics engine"))
    val meta = r.getAs[Map[String, String]]("metadata")
    assert(meta("lang") == "en")
    assert(meta("description").contains("cluster computing"))
    assert(meta("url") ==
      "https://en.wikipedia.org/api/rest_v1/page/summary/Apache_Spark")
  }

  test("githubApi decodes the recorded contents-API base64 payload") {
    val payload = fixture("github_contents_readme.json")
    val out = Readers.githubApi(spark, "acme", "demo-project", "main",
      Seq("README.md"), fetch = _ => payload)
    val r = out.collect().head
    assert(r.getAs[String]("doc_id") == "README.md")
    val text = r.getAs[String]("text")
    assert(text.startsWith("# demo-project"))
    assert(text.contains("Run `make build` and read docs/guide.md"))
    assert(r.getAs[Map[String, String]]("metadata")("sha")
      .startsWith("4a1b2c3d"))
  }

  test("youtubeSegments joins the recorded transcript segments in start " +
    "order") {
    val payload = fixture("youtube_transcript.json")
    val out = Readers.youtubeSegments(spark, Seq("vid42"),
      fetch = _ => payload)
    val r = out.collect().head
    assert(r.getAs[String]("doc_id") == "vid42")
    assert(r.getAs[String]("text") ==
      "welcome to the talk today we cover distributed joins " +
        "thanks for watching")
    assert(r.getAs[Int]("n_segments") == 3)
    // a malformed payload drops instead of exploding
    val bad = Readers.youtubeSegments(spark, Seq("vid43"),
      fetch = _ => "not json at all")
    assert(bad.count() == 0)
  }

  test("FileSystemTap tees frames to parquet and passes them through") {
    val dir = Files.createTempDirectory("tap").toString
    val tap = new graft.sources.FileSystemTap(dir, "run1")
    val docs = Seq((1L, "hello")).toDF("doc_id", "text")
    val through = tap.tapRawSources(docs)
    assert(through.collect().toSeq == docs.collect().toSeq)
    // the tee is on disk and independently readable
    val reread = spark.read.parquet(s"$dir/run1/raw_sources")
    assert(reread.count() == 1)
    tap.tapChunks(docs); tap.tapSources(docs)
    assert(new java.io.File(s"$dir/run1").listFiles().map(_.getName).toSet ==
      Set("raw_sources", "chunks", "sources"))
  }

  test("binary formats without a built-in or registered parser fail loudly") {
    // pdf/docx/pptx now have JDK-only built-ins (BinaryParsersSpec); the
    // loud-failure contract remains for everything else
    val e = intercept[UnsupportedOperationException](
      Readers.binaryDocuments(spark, "/tmp/x", "epub"))
    assert(e.getMessage.contains("registerParser"))
  }

  test("binary parser seam: registered codec parses golden files distributed") {
    // golden fixture: a fake "pdf" whose body is a GOLD1 header + UTF-8
    // payload; the registered parser validates the header and extracts the
    // payload — standing in for a PDFBox-style codec behind the same seam
    val dir = Files.createTempDirectory("bindocs").toFile
    def put(name: String, text: String): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      out.write(("GOLD1" + text).getBytes("UTF-8")); out.close()
    }
    put("a.pdf", "alpha body")
    put("b.pdf", "beta body")
    put("ignored.txt", "not a pdf")
    Readers.registerParser("pdf", bytes => {
      val s = new String(bytes, "UTF-8")
      require(s.startsWith("GOLD1"), "bad magic")
      s.drop(5)
    })
    try {
      val out = Readers.pdf(spark, dir.getAbsolutePath)
        .select(col("doc_id"), col("text")).as[(String, String)]
        .collect().sortBy(_._1)
      assert(out.map(_._2).toSeq == Seq("alpha body", "beta body"))
      assert(out.forall(_._1.endsWith(".pdf")))  // glob filtered the .txt
    } finally Readers.unregisterParser("pdf")
    // seam is per-format: registering pdf does not unlock formats that
    // also lack a built-in
    intercept[UnsupportedOperationException](
      Readers.binaryDocuments(spark, dir.getAbsolutePath, "epub"))
  }
}
