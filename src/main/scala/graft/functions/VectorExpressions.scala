package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the dense dot product.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — is a higher-order function: interpreted per element, one
  * array allocation per row (~10 µs/pair at 64-d). Pairwise similarity
  * evaluates this millions of times, so it gets the full
  * `doGenCode` treatment: a tight primitive loop inside whole-stage
  * codegen (~0.1 µs/pair), no allocation.
  *
  * Accumulation is a sequential index-order sum — bit-identical to
  * both the HOF fold it replaces and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(a,b), p -> p[1]*p[2]))`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double>; callers (VectorExpressions.dot) cast
  // upstream. ExpectsInputTypes is private[sql] in Spark 4, so the
  // input contract is enforced via checkInputDataTypes instead: the
  // function is registered session-wide as `graft_dot`, and without
  // this an SQL caller passing e.g. array<int> would read misaligned
  // bytes through getDouble and get garbage with no error.
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the SQ8 integer distance: the sum of
  * squared differences of two `array<int>` quantization codes, as a
  * long. Same rationale as [[DotProduct]]: the composable
  * `aggregate(zip_with(...))` form is an interpreted HOF with one
  * array allocation per pair, and SQ8 search evaluates this once per
  * (query, corpus vector) — the hot kernel of the scan. Integer
  * multiply-add in a tight codegen loop; arithmetic is exact, so the
  * value is bit-identical to the HOF form and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))` by construction.
  */
case class Sq8Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<int> (the sq8Encode output). Registered
  // session-wide as `graft_sq8dist`, so misuse must fail at analysis
  // time — on a non-array<int> column, UnsafeArrayData.getInt would
  // read misaligned bytes and return garbage with no error.
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8dist requires (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def prettyName: String = "graft_sq8dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = (x.getInt(i) - y.getInt(i)).toLong
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $d = (long) ($a.getInt($i) - $b.getInt($i));
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Idempotently register graft's native expressions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8dist",
      (exprs: Seq[Expression]) => Sq8Dist(exprs(0), exprs(1)),
      "built-in")
  }

  /** Dot product of two array<double> columns (requires `register`). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** SQ8 integer distance of two array<int> code columns (requires
    * `register`).
    */
  def sq8dist(a: Column, b: Column): Column =
    call_function("graft_sq8dist", a, b)
}
