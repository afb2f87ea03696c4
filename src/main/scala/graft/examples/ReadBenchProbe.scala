package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.tsdb.{FooterCache, StoreSettings, TimeSeriesStore}

/** The read-lane drift adjudicator (VERDICT r9 next #7): the driver's
  * point-read throughput drifted 4,976 → 3,185/s across rounds 8→9 while
  * staying inside the record's own run spread (2,627–4,786/s), so the
  * question is "environment or code?". This probe runs ONLY the
  * workload-shape store benches — same construction as [[graft.Bench]]'s
  * shape block (2,000-sample write batches; 1-tag/20 ms point reads,
  * single- and 8-threaded) — with per-phase FooterCache hit/miss counts,
  * so the 3-run protocol (three JVM invocations) isolates the read path
  * from the 219-query bench's heap pressure and GC history.
  *
  * Reading the evidence: a slow run with a HIGH footer hit rate is a real
  * serving-path regression (per-read cost grew); a slow run with a LOW
  * hit rate is file churn / cold metadata (environment). The adjudication
  * verdict lives in BASELINE.md §point-read drift.
  */
object ReadBenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-readbench").toString
    val store = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 120000L))
    store.initialize()
    val base = 1700000000000L
    def batch(i: Int): Map[String, Map[Long, String]] =
      (0 until 200).map { t =>
        s"Tag$t" -> (0 until 10).map(k =>
          (base + i * 10000L + k * 1000L) -> s"v$i-$k").toMap
      }.toMap
    store.write(batch(0)) // warm-up
    val nW = 8
    val wSec = (0 until 2).map { r =>
      val t0 = System.nanoTime()
      (1 to nW).foreach(i => store.write(batch(r * nW + i)))
      (System.nanoTime() - t0) / 1e9
    }.min

    val nR = 500 // round 16: match Bench's widened read window
    // untimed warm-up, same discipline as the query warm-up runs (JIT +
      // serving-index build are once-per-process costs, not rate)
      (0 until 100).foreach { i =>
        store.readData(Map(
          s"Tag${i % 200}" -> (base + i * 1000L - 10L, base + i * 1000L + 10L)))
      }
    FooterCache.resetCounts()
    val rSec = (0 until 2).map { _ =>
      val t1 = System.nanoTime()
      (0 until nR).foreach { i =>
        store.readData(Map(
          s"Tag${i % 200}" -> (base + i * 1000L - 10L, base + i * 1000L + 10L)))
      }
      (System.nanoTime() - t1) / 1e9
    }.min
    val (h1, m1) = FooterCache.counts

    FooterCache.resetCounts()
    val nThr = 8
    val cSec = (0 until 2).map { _ =>
      val t2 = System.nanoTime()
      val threads = (0 until nThr).map { t =>
        new Thread(() =>
          (0 until nR).foreach { i =>
            store.readData(Map(
              s"Tag${(t * nR + i) % 200}" ->
                (base + i * 1000L - 10L, base + i * 1000L + 10L)))
          })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t2) / 1e9
    }.min
    val (h8, m8) = FooterCache.counts

    spark.stop()
    println(f"""{"probe":"read_bench","ingest_samples_per_sec":${nW * 2000 / wSec}%.0f,""" +
      f""""point_reads_per_sec":${nR / rSec}%.2f,""" +
      f""""point_reads_per_sec_8thr":${nThr * nR / cSec}%.2f,""" +
      s""""footer_1thr":{"hits":$h1,"misses":$m1},""" +
      s""""footer_8thr":{"hits":$h8,"misses":$m8}}""")
  }
}
