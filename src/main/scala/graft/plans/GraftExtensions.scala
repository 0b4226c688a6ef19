package graft.plans

import graft.functions.VectorExpressions.{ByteAt, DotProductFloat}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Session extension wiring for graft's custom expressions
  * (`spark.sql.extensions=graft.plans.GraftExtensions`): SQL-callable
  * kernel functions plus the fusion rule below. This is the (c)-tier
  * extension point of the build rules — used where composing built-ins
  * can't reach: per-element loops that must run as one JVM kernel. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_product_float"),
      (args: Seq[Expression]) => DotProductFloat(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("byte_at"),
      new ExpressionInfo(classOf[ByteAt].getName, "byte_at"),
      (args: Seq[Expression]) => ByteAt(args(0), args(1))))
    ext.injectOptimizerRule(_ => FuseVectorKernels)
    ext.injectOptimizerRule(_ => StatsPruneRule)
    ext.injectPlannerStrategy(_ => AsOfStrategy)
  }
}

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)`
  * — and fuse it into the codegen'd [[DotProductFloat]] kernel (~80×
  * on the brute-force similarity benchmark). Users keep writing the
  * composable form; the plan runs the kernel.
  *
  * Unconditionally value-preserving: the kernel reproduces the HOF
  * form's null semantics bit-for-bit (null on null array, length
  * mismatch, or null slot — see [[DotProductFloat]]), so no
  * nullability guard is needed (file scans force `containsNull=true`
  * on array columns regardless of the declared read schema, so a
  * dense-only guard would never fire on real tables).
  */
object FuseVectorKernels extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Strip ONLY the exact float→double widening cast (lossless); any
    * other cast changes values and must block the rewrite. */
  private def stripWiden(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType && c.child.dataType == FloatType => c.child
    case other => other
  }

  /** `(x, y) -> double(x) * double(y)` — widening casts only. */
  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      body match {
        // double-typed product only: a float-typed product rounds each
        // term to float, which the double-accumulating kernel does not.
        case m @ Multiply(lhs, rhs, _) if m.dataType == DoubleType =>
          stripWiden(lhs).semanticEquals(x) && stripWiden(rhs).semanticEquals(y)
        case _ => false
      }
    case _ => false
  }

  /** `(acc, v) -> acc + v` — bare double vars, no casts. */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      body match {
        case Add(lhs, rhs, _) =>
          (lhs.semanticEquals(acc) && rhs.semanticEquals(v)) ||
            (lhs.semanticEquals(v) && rhs.semanticEquals(acc))
        case _ => false
      }
    case _ => false
  }

  /** identity finish lambda `acc -> acc`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) =>
      body.semanticEquals(acc)
    case _ => false
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zip: ZipWith, zero, merge, finish)
        if isZeroLiteral(zero) && isSumLambda(merge) && isIdentity(finish) &&
          isMultiplyLambda(zip.function) &&
          isFloatArray(zip.left) && isFloatArray(zip.right) =>
      DotProductFloat(zip.left, zip.right)
  }
}
