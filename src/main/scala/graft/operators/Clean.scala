package graft.operators

import graft.Tables
import graft.functions.NumericAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parse/clean + date derivation (SURVEY.md §2 A4, A5).
  *
  * Reference behavior: ETL strips NUL bytes and collapses newlines from
  * `summary` (arxiv_etl.py:84-86) and derives `published_date`/
  * `updated_date` DATE columns from ISO timestamps (arxiv_etl.py:60-67).
  */
object Clean {

  /** A4 `parse_clean` — control-char strip, whitespace collapse, trim,
    * lowercase. Pure `regexp_replace`/`lower`/`trim` (codegen'd, no
    * UDF), so at 100 TB this stays inside whole-stage codegen on the
    * scan's output with zero shuffles. */
  def parseClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        lower(trim(regexp_replace(
          regexp_replace($"text", "[\\x00-\\x1f]", " "),
          "\\s+", " "))).as("clean_text"))
      .withColumn("clean_len", length($"clean_text"))
  }

  val parseCleanSql: String =
    """SELECT doc_id,
      |       lower(trim(regexp_replace(regexp_replace(text, '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g'))) AS clean_text,
      |       CAST(length(lower(trim(regexp_replace(regexp_replace(text, '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g')))) AS INT) AS clean_len
      |FROM documents""".stripMargin

  /** A5 `date_derive` — timestamp → year/month derivation + monthly
    * rollup (the reference's `published_date` materialization feeding
    * its date-partitioned queries). At scale the derived columns become
    * partition keys for the sink (write.partitionBy(year, month)). */
  def dateDerive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(
        year($"o_orderdate").as("o_year"),
        month($"o_orderdate").as("o_month"),
        $"o_totalprice")
      .groupBy($"o_year", $"o_month")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("sum_price"))
  }

  val dateDeriveSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(month(o_orderdate) AS INT) AS o_month,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2""".stripMargin
}
