package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** Steady-state point-read rate: the bench shape with enough reads to
  * amortize JIT (the 25-read bench window measures startup, not rate).
  */
object PointReadSteady {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-prsteady").toString,
      StoreSettings(partitionWidth = 120000L))
    store.initialize()
    val base = 1700000000000L
    def batch(i: Int): Map[String, Map[Long, String]] =
      (0 until 200).map { t =>
        s"Tag$t" -> (0 until 10).map(k =>
          (base + i * 10000L + k * 1000L) -> s"v$i-$k").toMap
      }.toMap
    (0 to 16).foreach(i => store.write(batch(i)))
    val n = 4000
    (0 until 500).foreach { i => store.readData(Map(
      s"Tag${i % 200}" -> (base + i % 25 * 1000L - 10L, base + i % 25 * 1000L + 10L))) }
    (0 until 3).foreach { round =>
      val t0 = System.nanoTime()
      (0 until n).foreach { i =>
        store.readData(Map(
          s"Tag${i % 200}" -> (base + i % 25 * 1000L - 10L, base + i % 25 * 1000L + 10L)))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[steady] round=$round reads_per_sec=${n / dt}%.0f per_read_us=${dt / n * 1e6}%.1f")
    }
    spark.stop()
  }
}
