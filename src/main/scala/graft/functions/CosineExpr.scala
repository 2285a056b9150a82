package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * Codegen'd cosine similarity over two ARRAY<FLOAT|DOUBLE> columns — the one
 * custom Catalyst Expression the engine needs (SURVEY.md §4: the cosine scan
 * is the hot path of every retrieval; the reference vectorizes it with NumPy,
 * statement_utils.py:15-95).
 *
 * Compared to the higher-order-function composition in [[VectorFunctions]]
 * (zip_with + aggregate), this emits a single fused loop with no intermediate
 * array allocation, and it participates in whole-stage codegen. Accumulation
 * is a sequential double fold in index order — the same result, bit for bit,
 * as the composed version and the DuckDB oracle.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case ArrayType(ByteType, _) => true // int8-quantized store (1 byte/dim)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires ARRAY<FLOAT|DOUBLE|TINYINT> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  private def getter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case ByteType  => "getByte"
      case _         => "getDouble"
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lg = getter(left); val rg = getter(right)
    def get(d: ArrayData, g: String, i: Int): Double = g match {
      case "getFloat" => d.getFloat(i).toDouble
      case "getByte"  => d.getByte(i).toDouble
      case _          => d.getDouble(i)
    }
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, lg, i)
      val yv = get(y, rg, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.$lGet($i);
         |  double $yv = (double) $b.$rGet($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd dot product over two ARRAY<FLOAT|DOUBLE|TINYINT> columns — the
 * sibling of [[CosineSimilarity]] for callers that need the raw projection
 * (LSH hyperplane signs, attention logits). Bit-identical to the
 * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` composition: one sequential
 * double fold in index order.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case ArrayType(ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE|TINYINT> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  private def getter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case ByteType  => "getByte"
      case _         => "getDouble"
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(d: ArrayData, g: String, i: Int): Double = g match {
      case "getFloat" => d.getFloat(i).toDouble
      case "getByte"  => d.getByte(i).toDouble
      case _          => d.getDouble(i)
    }
    val lg = getter(left); val rg = getter(right)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(x, lg, i) * get(y, rg, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(left)
    val rGet = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  val FnName = "dot_product"

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[DotProduct],
      exprs => DotProduct(exprs.head, exprs(1)))

  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}

object CosineSimilarity {

  val FnName = "cosine_sim"

  /** Register `cosine_sim` in the session's function registry (once per
    * session). Makes the expression usable from both the Column API below
    * and plain SQL. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[CosineSimilarity],
      exprs => CosineSimilarity(exprs.head, exprs(1)))

  /** Column API: cosine(a, b) with native codegen ([[register]] first). */
  def cosine(a: Column, b: Column): Column = call_function(FnName, a, b)

  /** Cosine of a column against a constant query vector. */
  def cosineToQuery(a: Column, q: Seq[Double]): Column =
    cosine(a, lit(q.toArray))
}
