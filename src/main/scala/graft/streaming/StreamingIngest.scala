package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tsdb.{Sample, TimeSeriesStore}

/** Structured Streaming ingestion + purge topology — the reference's
  * example-microservice layout (reference:
  * examples/wrap-it-into-microservice/service.js:113-150) inside one Spark
  * app: a write stream feeding the hot table and a processing-time purge
  * loop with an archive-then-ack consumer.
  */
object StreamingIngest {

  /** Continuous ingestion: a stream of Samples appended micro-batch by
    * micro-batch into the store's hot tier via foreachBatch (each batch is
    * a normal partitioned append — identical layout to batch writes).
    *
    * @return (stream input handle, the running query)
    */
  def sampleStream(spark: SparkSession, store: TimeSeriesStore): (MemoryStream[Sample], StreamingQuery) = {
    import spark.implicits._
    val input = MemoryStream[Sample](implicitly[org.apache.spark.sql.Encoder[Sample]], spark)
    val q = input.toDS().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Sample], _: Long) =>
        val rows = batch.collect() // micro-batches are bounded (≤ write cap)
        if (rows.nonEmpty) store.writeSamples(rows.toIndexedSeq)
        ()
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    (input, q)
  }

  /** The periodic purge driver + consumer (service.js:123-134): every
    * trigger, mark aged partitions, then archive + ack each queue entry.
    * Runs as a rate-source stream so it lives inside the Structured
    * Streaming scheduler like any other query.
    *
    * @return the running purge query and a counter of acked partitions
    */
  def purgeLoop(spark: SparkSession, store: TimeSeriesStore,
      ageThresholdSec: Long, intervalMs: Long = 500): (StreamingQuery, AtomicLong) = {
    val acked = new AtomicLong(0L)
    val q = spark.readStream
      .format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .outputMode("append")
      .foreachBatch { (_: DataFrame, _: Long) =>
        store.purgeScan(ageThresholdSec, 10)
        store.pendingPurgeEntries().foreach { e =>
          store.archiveToCold(e.id)
          if (store.purgeAck(e.id, e.partitionName, e.tag) == 1)
            acked.incrementAndGet()
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(s"$intervalMs milliseconds"))
      .start()
    (q, acked)
  }

  /** Continuous last-write-wins dedup as custom streaming state
    * (`flatMapGroupsWithState`): one state cell per `(tag, ts)` holding the
    * current winner; a micro-batch emits a row only when a strictly newer
    * `(ingestTs, seq, writerId)` arrives — the streaming rendering of the
    * engine's read-side LWW (SURVEY §2.1 #6). With `stateTtlMs > 0` state
    * expires after that much processing-time inactivity (mirroring the
    * reference's processing-time purge semantics, §2.2) — note that a
    * registered timeout keeps the micro-batch scheduler ticking, so
    * bounded tests should pass `stateTtlMs = 0` (no timeout).
    */
  def streamingLww(spark: SparkSession, input: org.apache.spark.sql.Dataset[Sample],
      stateTtlMs: Long = 3600000L): org.apache.spark.sql.Dataset[Sample] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    def newer(a: Sample, b: Sample): Boolean =
      a.ingestTs > b.ingestTs ||
        (a.ingestTs == b.ingestTs && (a.seq > b.seq ||
          (a.seq == b.seq && a.writerId > b.writerId)))
    input.groupByKey(s => (s.tag, s.ts))
      .flatMapGroupsWithState[Sample, Sample](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[Sample]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val incoming = rows.toSeq
            if (incoming.isEmpty) Iterator.empty
            else {
              val best = incoming.reduce((a, b) => if (newer(a, b)) a else b)
              val winner = state.getOption match {
                case Some(cur) if !newer(best, cur) => None
                case _ => Some(best)
              }
              winner.foreach { w =>
                state.update(w)
                if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
              }
              winner.iterator
            }
          }
      }
  }

  /** Event-time windowed aggregation over a file stream — the streaming
    * rendering of the engine's read-side analytics (watermark + tumbling
    * window). Returns the completed result as a DataFrame by draining the
    * stream into a memory sink (file source is bounded here, so
    * processAllAvailable terminates).
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String,
      windowMs: Long = 3600000L): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"st_win_${System.nanoTime()}"
    // the file source wants a directory: stream the containing dir with a
    // glob filter selecting just the events table
    val q = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(
        window(col("event_time"), s"$windowMs milliseconds").as("win"),
        col("event_type").as("tag"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_millis(col("win.start")).as("window_start"), col("tag"),
        col("n"), col("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy("window_start", "tag")
  }
}
