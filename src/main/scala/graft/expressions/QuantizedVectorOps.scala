package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd quantized dot product of two `array<float>` embedding columns.
  *
  * Semantics (must stay bit-identical to the SQL/DuckDB oracle form):
  * each element is quantized `floor(x * 10000 + 0.5)` in double precision,
  * the products are summed as exact Longs. Equivalent declarative form:
  * `aggregate(zip_with(qa, qb, (x,y) -> x*y), 0L, +)` — but Catalyst
  * higher-order functions run interpreted (per-row closure dispatch plus
  * per-element boxing), which measured ~30× slower on the ANN benchmark.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen instead.
  *
  * Usage: [[graft.functions.VectorFunctions.dotQF]].
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantized_dot expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val qx = math.floor(xs.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      val qy = math.floor(ys.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      acc += qx * qy
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qx = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
         |  long $qy = (long) java.lang.Math.floor(((double) $b.getFloat($i)) * 10000.0 + 0.5);
         |  ${ev.value}Acc += $qx * $qy;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_dot"
}

/** Codegen'd exact dot product of two `array<long>` columns — the
  * companion of [[QuantizedDotProduct]] for vectors that are ALREADY
  * quantized (e.g. k-means centroids, which are integer means of
  * quantized components and never existed as floats). Same tight
  * primitive loop inside whole-stage codegen; the declarative
  * `aggregate(zip_with(...))` form runs interpreted.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_dot expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}
