package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** The engine's last-write-wins total order `(ingestTs, seq, writerId)`
  * as a typed `Aggregator`, registered as a real UDAF — SURVEY §2.2's
  * "only candidate custom aggregate" (reference: the read-side LWW merge,
  * index.js:283-292), now a first-class SQL function:
  *
  * {{{ SELECT tag, lww_value(value, ingest_ts, seq, writer_id) FROM ... GROUP BY tag }}}
  *
  * The aggregation buffer is ONE winner tuple — O(1) state per group,
  * map-side combined like any hash aggregate, so a 100 TB LWW collapse
  * sends one row per group per task across the network. `reduce` and
  * `merge` share the same total order as [[graft.streaming.Lww]], so the
  * UDAF, the relational `max_by(struct)` form, and the streaming state
  * processors are provably the same semantics.
  */
object LwwAggregator {

  /** Aggregation input AND buffer: a candidate winner. */
  final case class Win(value: String, ingestTs: Long, seq: Long, writerId: String)

  private def newer(a: Win, b: Win): Boolean =
    a.ingestTs > b.ingestTs ||
      (a.ingestTs == b.ingestTs && (a.seq > b.seq ||
        (a.seq == b.seq && a.writerId > b.writerId)))

  /** `Win` with `ingestTs = Long.MinValue` marks the empty buffer — any
    * real row wins against it (real ingest timestamps are nonnegative).
    */
  val lww: Aggregator[Win, Win, String] = new Aggregator[Win, Win, String] {
    override def zero: Win = Win(null, Long.MinValue, Long.MinValue, "")
    override def reduce(b: Win, a: Win): Win = if (newer(a, b)) a else b
    override def merge(x: Win, y: Win): Win = if (newer(y, x)) y else x
    override def finish(w: Win): String = w.value
    override def bufferEncoder: Encoder[Win] = Encoders.product[Win]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Register `lww_value(value, ingest_ts, seq, writer_id)` on the
    * session. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.udf.register("lww_value", functions.udaf(lww))
}
