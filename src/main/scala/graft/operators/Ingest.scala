package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-side operators (SURVEY.md §2 A1, A13, A14).
  *
  * Reference behavior re-expressed: the collector groups records into
  * fixed-size batches with deterministic ids and per-batch counts
  * (arxiv_collector.py:221-257), ETL parses jsonl lines into typed rows
  * (arxiv_etl.py:128-146), and JSONB-style payload fields are extracted
  * into typed columns (create_table.sql:63,71).
  */
object Ingest {

  /** A1 `ingest_batch_assign` — deterministic fixed-size batching.
    * Each `source` partition is ordered by doc_id and chunked into
    * batches of `batchSize`, yielding the reference's
    * `{category}_batch_{n}` ids plus per-batch record counts.
    *
    * Scale: one shuffle on `source` for the window; at 100 TB the same
    * shape holds as long as no single source key dominates — for a
    * heavy-hitter source, pre-split by a salt on a range of the order
    * key (the batch id stays deterministic because it derives from the
    * global row_number within the source).
    */
  def batchAssign(spark: SparkSession, dir: String, batchSize: Int = 100,
                  runDate: String = "2024-01-01"): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(spark, dir)
      .select($"source", $"doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", floor(($"rn" - 1) / lit(batchSize)).cast(LongType))
      .groupBy($"source",
        concat($"source", lit(s"_${runDate}_batch_"), $"batch_idx").as("batch_id"))
      .agg(
        count(lit(1)).as("record_count"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
  }

  def batchAssignSql(batchSize: Int = 100, runDate: String = "2024-01-01"): String =
    s"""WITH numbered AS (
       |  SELECT source, doc_id,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents)
       |SELECT source,
       |       source || '_${runDate}_batch_' || CAST(CAST(FLOOR((rn - 1) / $batchSize.0) AS BIGINT) AS VARCHAR) AS batch_id,
       |       COUNT(*) AS record_count,
       |       MIN(doc_id) AS min_doc_id,
       |       MAX(doc_id) AS max_doc_id
       |FROM numbered
       |GROUP BY 1, 2""".stripMargin

  /** A13 `jsonl_ingest` — jsonl round-trip with schema enforcement.
    * Documents are serialized to JSON lines (`to_json`) and re-parsed
    * with an explicit schema (`from_json`), the Spark-native form of
    * the reference's gzip-jsonl → typed-row ETL; the aggregate proves
    * the round trip is lossless. At scale this is the pattern for
    * `spark.read.schema(s).json(path)` over S3 objects — schema
    * enforced at the scan, corrupt records quarantined via
    * `columnNameOfCorruptRecord`. */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    Tables.documents(spark, dir)
      .select(to_json(struct($"doc_id", $"lang", $"n_chars")).as("line"))
      .select(from_json($"line", schema).as("rec"))
      .select($"rec.lang".as("lang"), $"rec.n_chars".as("n_chars"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }

  val jsonlRoundtripSql: String =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY lang""".stripMargin

  /** A14 `json_extract` — typed extraction from a JSON payload column
    * (`props` = `{"k": <int>}`), the JSONB-column analogue. Uses
    * `get_json_object` (codegen'd path evaluation, no UDF). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast(LongType).as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"k").as("sum_k"))
  }

  val jsonExtractSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type""".stripMargin
}
