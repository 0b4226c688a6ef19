package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run on EMPTY tables without throwing —
  * at lake scale empty partitions, empty date slices, and freshly
  * created tables are routine, and an operator that head()s, divides,
  * or windows its way into an exception on zero rows is a production
  * incident. Builds a zero-row clone of the testdata layout once and
  * drives the full registry over it. */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events: copy the RAW file schema (nanos ts column) before the
    // Tables.events cast, so the empty clone round-trips identically
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("all registered queries run on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).count() // any row count is fine; throwing is not
        spark.catalog.clearCache()
        None
      } catch {
        case e: Throwable =>
          spark.catalog.clearCache()
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
