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
    val s = spark
    // real parquet scan; the loader's explicit schema carries the
    // dense-array contract (containsNull=false) the rule requires
    val df = Tables.embeddings(s, sf)
      .select(col("embedding").as("va"), col("embedding").as("vb"))

    val q = df.select(expr(hofDot).as("dot"))
    val before = q.queryExecution.optimizedPlan.toString
    assert(!before.contains("dot_product_float"))
    val expected = q.collect().map(_.getDouble(0)).toSeq

    s.experimental.extraOptimizations ++= Seq(FuseVectorKernels)
    try {
      val fused = df.select(expr(hofDot).as("dot"))
      val plan = fused.queryExecution.optimizedPlan.toString
      assert(plan.contains("dot_product_float"), s"rule did not fire:\n$plan")
      val vals = fused.collect().map(_.getDouble(0)).toSeq
      assert(vals == expected)
    } finally {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations.filterNot(_ == FuseVectorKernels)
    }
  }

  test("kernel agrees with HOF fold on real embeddings") {
    val e = Tables.fanout(Tables.embeddings(spark, sf)).limit(50)
      .select(col("embedding").as("va"), col("embedding").as("vb"))
    val hof = e.select(expr(hofDot).as("d")).collect().map(_.getDouble(0))
    val kernel = e.select(
      graft.functions.VectorExpressions.dotF(col("va"), col("vb")).as("d"))
      .collect().map(_.getDouble(0))
    assert(hof.toSeq == kernel.toSeq)
  }
}
