package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md). */
object Tables {

  /** Hour-wide time partitions for the events table — the analog of the
    * reference's `orderedPartitionWidth` (reference default 120000 ms,
    * /root/reference/index.js:46; hours keep partition counts sane for a
    * month of data).
    */
  val EventPartitionWidthMs = 3600000L

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` table with a millisecond epoch column.
    *
    * The file stores `ts` as Parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw Long (`spark.sql.legacy.parquet.nanosAsLong`); `ts_ms`
    * uses integer division — double-based division loses precision at
    * 1e18 nanoseconds.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle over the same tables.
  * Column names/aliases MUST match between the two — the driver's compare
  * sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])
