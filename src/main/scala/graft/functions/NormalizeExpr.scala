package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization as a codegen'd Catalyst expression — the text
 * canonicalization step every multilingual corpus pipeline runs before
 * hashing/deduplication (CCNet-style cleaning normalizes before hashing;
 * without it "café" composed and "café" decomposed are different dedup
 * keys, different shingles, different BPE sequences).
 *
 * `form` is one of NFC / NFD / NFKC / NFKD (validated at construction —
 * a bad form name fails the QUERY ANALYSIS, not a task at runtime).
 *
 * Scale shape: stays inside whole-stage codegen (no UDF serialization
 * boundary), and the generated code takes the `Normalizer.isNormalized`
 * fast path first — for the overwhelmingly-already-NFC corpus the row
 * costs one quick-check scan and ZERO allocations (the input UTF8String
 * passes through), so the expression is nearly free on ASCII text and
 * pays the normalization walk only where a combining sequence exists.
 *
 * The JDK and DuckDB's `nfc_normalize` implement the same Unicode
 * standard annex (UAX #15), which is what makes the NFC path
 * oracle-gateable (q_nfc_normalize).
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize form must be one of " +
      s"${UnicodeNormalize.Forms.mkString("/")}, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires STRING input, got ${dt.sql}")
  }

  override def dataType: DataType = StringType

  @transient private lazy val jform = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, jform)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, jform))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("str")
      // `form` is validated to an enum constant name, safe to interpolate
      val f = s"java.text.Normalizer.Form.$form"
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $f)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $f));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  val FnName = "unicode_normalize"

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[UnicodeNormalize],
      exprs => UnicodeNormalize(exprs.head,
        exprs(1).eval().asInstanceOf[UTF8String].toString))

  /** Column API: `unicodeNormalize(c, "NFC")` ([[register]] first, or via
    * GraftExtensions). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    call_function(FnName, c, org.apache.spark.sql.functions.lit(form))
}
