package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token count of a single-space-separated
  * string, equal by construction to `size(split(s, " "))` (separators + 1,
  * empty tokens included) but without materializing the array — one pass
  * over the UTF-8 bytes, fully codegen'd.
  *
  * This is the engine's custom-`Expression` exemplar (preference order (b)
  * of the build mandate): built-ins first, a native expression only where
  * the composed form allocates per row on a 100 TB scan.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var i = 0
    var n = 1
    while (i < s.numBytes) {
      if (s.getByte(i) == 0x20) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // every local through freshName: two TokenCount instances in one
      // generated function would otherwise redefine the loop variable and
      // kick the whole predicate back to interpreter mode
      val i = ctx.freshName("i")
      s"""
         |int ${ev.value}_n = 1;
         |for (int $i = 0; $i < $c.numBytes(); $i++) {
         |  if ($c.getByte($i) == (byte) 0x20) ${ev.value}_n++;
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Optimizer rule: rewrite `size(split(s, " ", -1))` to [[TokenCount]].
  * The single-space pattern has no regex metacharacters, so the rewrite is
  * semantics-preserving including empty tokens.
  */
object RewriteTokenCount extends Rule[LogicalPlan] {
  private val space = UTF8String.fromString(" ")
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(StringSplit(str, Literal(sep: UTF8String, _), Literal(-1, _)), _)
        if sep == space =>
      TokenCount(str)
  }
}

/** Session extensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or add
  * [[RewriteTokenCount]] to `spark.experimental.extraOptimizations` on a
  * live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteTokenCount)
  }
}

object GraftFunctions {
  /** Register `token_count` for SQL + call_function use on a session.
    * Idempotent AND quiet: re-registration is guarded by a registry
    * lookup so per-query callers don't spam "replaced a previously
    * registered function" WARNs into every artifact tail.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("token_count")))
      reg.createOrReplaceTempFunction(
        "token_count", exprs => TokenCount(exprs.head), "scala_udf")
  }

  /** Column API (requires [[register]] on the session first). */
  def token_count(c: Column): Column = call_function("token_count", c)
}
