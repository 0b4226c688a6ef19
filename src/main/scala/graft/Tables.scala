package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-generated testdata layout
  * (`<dir>/<table>.parquet`).
  *
  * Plain `spark.read.parquet` so Catalyst handles column pruning and
  * filter pushdown at the scan: callers `.select`/`.filter` and the
  * parquet reader sees `ReadSchema`/`PushedFilters` accordingly. At
  * cluster scale the same loaders work against a directory of many
  * files; nothing here assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
