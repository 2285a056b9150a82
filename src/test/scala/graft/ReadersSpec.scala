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

  test("binary document formats fail loudly") {
    intercept[UnsupportedOperationException](Readers.pdf(spark, "/tmp/x.pdf"))
    intercept[UnsupportedOperationException](Readers.docx(spark, "/tmp/x.docx"))
  }
}
