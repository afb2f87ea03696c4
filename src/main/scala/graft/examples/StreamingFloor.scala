package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Measures the bounded-drain micro-batch scheduling FLOOR of each
  * streaming-topology class the `st_*` bench rows use (VERDICT r7 #5).
  *
  * Every `st_*` bench row pays a fixed harness cost that has nothing to do
  * with its operator: file-source listing over the sf dir, query start/
  * checkpoint-dir setup, state-store instantiation (8 shuffle partitions
  * per stateful operator), one micro-batch of scheduling, memory-sink
  * materialization, and query stop. At sf0.1 the events table is only
  * 100k rows, so that floor dominates the row — a regression hunt that
  * compares raw row seconds across rounds chases the harness, not the
  * operator.
  *
  * This probe times each topology class over the SAME `eventStream` file
  * source with a `WHERE false` pushed into the scan — all harness
  * mechanics engage (listing, batch scheduling, state-store init for the
  * stateful shapes), zero rows flow — which is the per-row overhead the
  * bench reading rule should subtract. 3 runs per class; min and median
  * reported (the min is the steady-state floor, the spread is scheduler
  * noise).
  *
  * Output: one JSON line per class + a summary line, consumed into
  * BASELINE.md's floor table.
  */
object StreamingFloor {

  private def emptyEvents(spark: SparkSession, sfDir: String): DataFrame =
    StreamingIngest.eventStream(spark, sfDir).where(lit(false))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // One topology per structural class of the 18 st_* rows. The operator
    // inside is real engine machinery where a class has one (funnel's
    // flatMapGroupsWithState, the LWW transformWithState processor) so
    // state-store column-family layout matches the bench rows.
    val topologies: Seq[(String, () => DataFrame)] = Seq(
      // stateless projection drains (st_anomaly, st_mm_features)
      "stateless" -> (() =>
        StreamingIngest.drain(
          emptyEvents(spark, sfDir).select(col("event_id"), col("ts_ms")),
          "append")),
      // shuffled aggregation, complete mode (st_window_agg, st_histogram,
      // st_topk-shaped rollups)
      "shuffle_agg" -> (() =>
        StreamingIngest.drain(
          emptyEvents(spark, sfDir).groupBy(col("event_type"))
            .agg(count(lit(1)).as("n")),
          "complete")),
      // watermarked session-window aggregation (st_session_window, st_ohlc,
      // st_vwap — the event-time stateful agg class)
      "session_window" -> (() =>
        StreamingIngest.drain(
          emptyEvents(spark, sfDir)
            .withWatermark("event_time", "0 seconds")
            .groupBy(session_window(col("event_time"), "1800000 milliseconds"),
              col("user_id"))
            .agg(count(lit(1)).as("n")),
          "complete")),
      // flatMapGroupsWithState machines (st_funnel, st_debounce,
      // st_retention, st_lww_state, st_scd2)
      "fmgws" -> (() =>
        StreamingIngest.drain(
          StreamingIngest.funnelSnapshots(
            emptyEvents(spark, sfDir)
              .select(col("user_id").as[Long], col("event_type").as[String],
                col("ts_ms").as[Long]))
            .toDF("user_id", "t1", "t2", "t3"),
          "append")),
      // dropDuplicates + agg, two chained stateful operators (st_dedup_agg,
      // st_passage_dedup)
      "dedup_agg" -> (() =>
        StreamingIngest.drain(
          emptyEvents(spark, sfDir).dropDuplicates("event_id")
            .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
          "complete")),
      // stream-stream join (st_stream_join)
      "stream_join" -> (() => {
        val l = emptyEvents(spark, sfDir)
          .select(col("event_id").as("view_id"), col("user_id").as("l_user"),
            col("event_time").as("l_time"))
          .withWatermark("l_time", "0 seconds")
        val r = emptyEvents(spark, sfDir)
          .select(col("event_id").as("purchase_id"), col("user_id").as("r_user"),
            col("event_time").as("r_time"))
          .withWatermark("r_time", "0 seconds")
        StreamingIngest.drain(
          l.join(r, col("l_user") === col("r_user") &&
            col("r_time").between(col("l_time"),
              col("l_time") + expr("INTERVAL 1 HOUR"))),
          "append")
      })
    )

    def entry(k: String, v: Double) = "\"" + k + "\":" + "%.3f".format(v)
    val rows = topologies.map { case (name, mk) =>
      mk().count() // warm-up: JIT, codegen, file-listing cache
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(s"""{"floor":"$name","min_sec":${"%.3f".format(times.head)},""" +
        s""""median_sec":${"%.3f".format(times(1))},"max_sec":${"%.3f".format(times(2))}}""")
      name -> times.head
    }
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"streaming_floor","unit":"sec","sf":"$sfName",""" +
      s""""floors":${rows.map { case (k, v) => entry(k, v) }.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
