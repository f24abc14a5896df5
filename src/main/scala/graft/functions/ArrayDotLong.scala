package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native exact dot product over two `array<bigint>` columns.
  *
  * Motivation (measured, see the sf0.1 bench history): the composable
  * `aggregate(zip_with(a, b, _*_), 0, _+_)` form runs on Spark's
  * interpreted higher-order-function path and gets re-evaluated per
  * reference; this expression stays inside whole-stage codegen as a tight
  * primitive loop — the "custom Catalyst Expression beats UDF beats
  * interpreted HOF" rung for the ANN/similarity hot path.
  *
  * Null contract: null input array → null result; elements are read with
  * `getLong` (producers — Similarity.quantize — never emit null
  * elements).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native functions (usable both via
  * `GraftFunctions.register(spark)` and SQL `graft_dot(a, b)`). The
  * (identifier, info, builder) triples are shared with the
  * `spark.sql.extensions` path (GraftExtensions) so the two deployment
  * modes can't drift. */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotLong].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"graft_dot expects 2 arguments, got ${children.size}")
        ArrayDotLong(children.head, children(1))
      }),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsLong].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"graft_bloom_contains expects 2 arguments, got ${children.size}")
        BloomContainsLong(children.head, children(1))
      }))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id))
        registry.registerFunction(id, info, builder)
    }
  }
}
