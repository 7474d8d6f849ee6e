package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The lambda-HOF formulation `aggregate(zip_with(x, y, _*_), 0, _+_)`
  * is interpreted (HigherOrderFunction has no codegen), allocates a
  * zipped intermediate array per row, and boxes every element. This
  * expression participates in whole-stage codegen as a tight primitive
  * loop — no allocation, no boxing — which is the difference between a
  * flop-bound and an interpreter-bound scan when ANN scoring reads
  * billions of vectors. Element nulls are not expected (embedding
  * vectors are dense); a null element contributes getDouble's raw slot.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch (below) — nullable even for non-null children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // Length mismatch → NULL, matching the lambda-HOF fallback
  // (zip_with null-pads, so the aggregate sum goes NULL): both dot()
  // paths agree instead of the min-length truncation r1 shipped.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VectorExpressions {
  /** Idempotent per-session registration so `call_function("vec_dot")`
    * resolves. Temp-function scope keeps the engine a library — no
    * SparkSessionExtensions wiring required of the caller.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", Arity.binary("vec_dot")(VecDot), "built-in")
}
