package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal decomposition helpers over the events shape
  * (event_type, ts_ms, event_id, value).
  */
object Seasonal {

  /** Detrended hour-of-day seasonal profile — the STL decompose step the
    * raw per-hour profile (`ts_seasonal_profile`) skips: subtract a
    * ±12-row centered moving trend per tag, then profile the residual by
    * hour-of-day, separating daily shape from level drift (a ramping
    * series has a FLAT detrended profile; the raw profile would tilt).
    *
    * Exactness: only interior rows (full 25-row window) contribute, so
    * the detrended value scales to the constant-denominator exact
    * integer `d25 = 25·x − Σwindow` — any linear trend cancels
    * identically (`Σ(a+b·j) = 25·(a+b·i)` for the centered window) —
    * and the single double division happens once per output row, so the
    * DuckDB oracle matches bit-for-bit.
    *
    * Scale shape: one tag-keyed window + one (tag, hour) aggregate —
    * both partition on event_type; output is |tags|·24 rows.
    */
  def detrendedProfile(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
    val wT = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_ms"), col("event_id")).rowsBetween(-12, 12)
    events
      .select(col("event_type"), col("ts_ms"), col("event_id"),
        cents.as("cents"))
      .withColumn("sw", sum(col("cents")).over(wT))
      .withColumn("nw", count(lit(1)).over(wT))
      .where(col("nw") === 25)
      .withColumn("d25", col("cents") * 25 - col("sw"))
      .groupBy(col("event_type"),
        expr("(ts_ms div 3600000) % 24").as("hod"))
      .agg(count(lit(1)).as("n"), sum(col("d25")).as("sum_d25"))
      .withColumn("seasonal",
        col("sum_d25").cast("double") /
          (col("n") * 25).cast("double") / lit(100.0))
  }
}
