package graft

import graft.plans.FuseVectorKernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fusion rule rewrites the declarative HOF dot product into the
  * codegen kernel without changing results. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  private val hofDot =
    "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"

  test("FuseVectorKernels: HOF dot product plans as dot_product_float, same values") {
    // TestSpark loads GraftExtensions (production parity), so the rule
    // is active session-wide: the declarative form must plan AS the
    // kernel, and its values must equal a driver-side reference fold.
    val df = Tables.embeddings(spark, sf)
      .select(col("embedding").as("va"), col("embedding").as("vb"))
    val q = df.select(expr(hofDot).as("dot"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product_float"), s"rule did not fire:\n$plan")
    val vals = q.collect().map(_.getDouble(0))
    val ref = df.collect().map { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(vals.sameElements(ref))
    // guard case: a FLOAT-typed product (rounds each term) must NOT fuse
    // into the double-accumulating kernel
    val floatForm =
      "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + cast(v as double))"
    val unfused = df.select(expr(floatForm).as("dot"))
    assert(!unfused.queryExecution.optimizedPlan.toString.contains("dot_product_float"))
  }

  test("byte_at SQL function is session-registered and reads payload bytes") {
    val r = spark.sql(
      "SELECT byte_at(cast('AB' as binary), 0) AS b0, byte_at(cast('AB' as binary), 5) AS oob")
      .head()
    assert(r.getInt(0) == 'A'.toInt && r.isNullAt(1))
  }

  test("kernel agrees with a driver-side fold on real embeddings") {
    // NOTE: with GraftExtensions active session-wide, the HOF form
    // would itself plan as the kernel — comparing the two would be
    // kernel-vs-kernel (vacuous). The independent reference must live
    // outside the optimizer: a driver-side sequential fold.
    val e = Tables.fanout(Tables.embeddings(spark, sf)).limit(50)
      .select(col("embedding").as("va"), col("embedding").as("vb"))
    val kernel = e.select(
      graft.functions.VectorExpressions.dotF(col("va"), col("vb")).as("d"),
      col("va"))
      .collect()
    kernel.foreach { r =>
      val a = r.getSeq[Float](1)
      val ref = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      assert(r.getDouble(0) == ref, "kernel diverges from sequential driver fold")
    }
  }
}
