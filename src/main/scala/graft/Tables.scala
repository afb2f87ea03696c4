package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The `events` table with a millisecond epoch column (`ts_ms`,
    * LongType), regardless of how the driver encoded `ts` — the testdata
    * has shipped both Parquet TIMESTAMP(NANOS) (readable only as a raw
    * Long via the legacy conf) and plain timestamp[us].
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    withTsMs(eventsRaw(spark, sfDir))

  /** Raw `events` read with encoding dispatch. The legacy-conf write is
    * scoped to the NANOS branch: a timestamp-typed file never mutates
    * session state, and the conf itself is inert for non-NANOS parquet.
    */
  private[graft] def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    try load(spark, sfDir, "events")
    catch {
      case e: Throwable if causeChain(e).exists(m => m.contains("NANOS") || m.contains("nanosAsLong")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(spark, sfDir, "events")
    }

  /** Derives `ts_ms` from any `ts` encoding with SESSION-TIMEZONE-FREE
    * integer arithmetic, matching the DuckDB oracles' `epoch_ms(ts)`:
    *  - int64 nanos: `div` (double division loses precision at 1e18);
    *  - TIMESTAMP (an instant): `unix_millis`, which reads the stored
    *    epoch micros directly;
    *  - TIMESTAMP_NTZ (a wall clock): interpreted as UTC via a pure
    *    wall-clock `timestampdiff` against the NTZ epoch — a cast to
    *    TimestampType would instead interpret it in the session timezone
    *    and silently shift `ts_ms` for any caller not pinned to UTC.
    */
  private[graft] def withTsMs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts_ms", expr("ts div 1000000"))
    case TimestampType =>
      df.withColumn("ts_ms", unix_millis(col("ts")))
    case TimestampNTZType =>
      df.withColumn("ts_ms", expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 1000"))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts must be int64 nanos or a timestamp column; got $other")
  }

  private def causeChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

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
/** One registered engine query. `benchExcluded = true` marks an eval-only
  * row (a recall/quality audit whose cost is quadratic BY CONSTRUCTION —
  * query set ∝ corpus): it stays oracle-gated for correctness but is
  * excluded from the headline bench total and timed separately; each has
  * a fixed-budget `_bounded` twin that IS the production lane.
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchExcluded: Boolean = false)
