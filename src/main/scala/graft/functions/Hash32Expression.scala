package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's base hash — the
  * codegen'd fast path of `TextFunctions.hash32` (brief preference
  * order: native `Expression` with `doGenCode` > composed built-ins >
  * UDF). Semantics are bit-identical to
  * `conv(substring(md5(s),1,8),16,10)`: the first 8 md5 hex chars are
  * exactly the first 4 digest bytes read as an unsigned 32-bit int, so
  * this skips the hex-string round trip (md5 → 32-char string →
  * substring → base-16 parse) the composed version pays per call.
  *
  * Stays inside whole-stage codegen via `defineCodeGen` (a single
  * static call on the UTF8String bytes) — no interpreted fallback.
  */
case class Hash32Expression(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash32 expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    GraftHashUtil.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHashUtil.hash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash32Expression =
    copy(child = newChild)
}

/** Static home for the codegen call target (Scala object = static
  * forwarders visible to generated Java).
  */
object GraftHashUtil {
  // ThreadLocal digest (r10 review): this IS the hot path the native
  // expression exists for, and MessageDigest.getInstance is a
  // synchronized provider lookup + allocation that was paid PER ROW;
  // digest() leaves the instance reset, so reuse is safe. The static
  // call shape codegen needs is unchanged.
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def hash32(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** `SparkSessionExtensions` wiring: registers `graft_hash32` so SQL text
  * and `call_function` resolve it. Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.hash32Descriptor)
    ext.injectFunction(GraftExtensions.dotDescriptor)
    ext.injectOptimizerRule(_ => Hash32Rewrite)
    ext.injectOptimizerRule(_ => VectorFoldRewrite)
  }
}

object GraftExtensions {
  // arity validated in the builder (r10 review): a wrong-arity SQL call
  // used to surface children.head/children(1) internals
  // (NoSuchElement/IndexOutOfBounds) instead of an analysis-time message
  private[functions] val hash32Descriptor = (
    FunctionIdentifier("graft_hash32"),
    new ExpressionInfo(classOf[Hash32Expression].getName, "graft_hash32"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"graft_hash32 requires exactly 1 argument, got ${children.length}")
      Hash32Expression(children.head): Expression
    })

  private[functions] val dotDescriptor = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_dot requires exactly 2 arguments, got ${children.length}")
      DotProduct(children(0), children(1)): Expression
    })

  /** Direct registration on an existing session (tests, driver-provided
    * sessions built without the extensions config). Also installs the
    * rewrite rules via `experimental.extraOptimizations`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      hash32Descriptor._1, hash32Descriptor._2, hash32Descriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    val rules = Seq(Hash32Rewrite, VectorFoldRewrite)
      .filterNot(spark.experimental.extraOptimizations.contains)
    if (rules.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ rules
  }
}

/** Optimizer rule: rewrite the portable composed hash —
  * `CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)` — into the
  * native [[Hash32Expression]]. Library code stays written against
  * documented built-ins (and keeps working on any vanilla session);
  * sessions with the extension get the fused fast path for free. The
  * Catalyst-rule tier of the brief's custom-operator ladder, wired via
  * `SparkSessionExtensions.injectOptimizerRule` /
  * `experimental.extraOptimizations`.
  */
object Hash32Rewrite
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{BinaryType, LongType}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case Conv(Substring(Md5(inner), IntLit(1), IntLit(8)), IntLit(16), IntLit(10), _) =>
            stringSource(inner).map(Hash32Expression(_)).getOrElse(c)
          case _ => c
        }
    }

  /** md5() over a string goes through an implicit binary cast — unwrap
    * it; reject non-string sources (different bytes → different hash).
    */
  private def stringSource(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == BinaryType && c.child.dataType == StringType => Some(c.child)
    case s if s.dataType == StringType => Some(s)
    case _ => None
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }
}
