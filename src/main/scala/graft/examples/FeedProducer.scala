package graft.examples

import java.nio.file.{Files, Paths}

import graft.streaming.FeedLog

/** Foreign-JVM producer for the `graft-feed` broker-log source — the
  * process on the OTHER side of the feed (the reference's producers
  * XADD into the Redis stream from any process; service.js:119-120's
  * consumer group only ever sees the log). Deliberately Spark-free:
  * the point of the topology is that data enters the log from outside
  * the consumer's JVM and outside Spark entirely, and the consumer's
  * only contact surface is offset-ranged reads of immutable bytes.
  *
  * Args: `<logDir> <segBytes> <rounds> <rowsPerRound> <sleepMs> <baseTs> <doneFile>`
  * Round r writes `rowsPerRound` newline-free JSON records
  * `{"tag":"feedK","ts":<baseTs + (r*rpr+i)*1000>,"value":"v<r>:<i>"}`
  * (K = i%3), then sleeps `sleepMs` — a steady append load that rolls
  * segments mid-stream so the consumer sees partitions appear over time.
  */
object FeedProducer {
  def main(args: Array[String]): Unit = {
    val Array(dir, segBytes, rounds, rpr, sleepMs, baseTs, done) = args
    val log = Paths.get(dir)
    for (r <- 0 until rounds.toInt) {
      val recs = (0 until rpr.toInt).map { i =>
        val k = r * rpr.toInt + i
        s"""{"tag":"feed${i % 3}","ts":${baseTs.toLong + k * 1000L},""" +
          s""""value":"v$r:$i","ingestTs":${r + 1},"writerId":"px","seq":$k}"""
      }
      FeedLog.append(log, recs, segBytes.toLong)
      Thread.sleep(sleepMs.toLong)
    }
    Files.write(Paths.get(done), Array.emptyByteArray)
  }
}
