package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.tsdb.{Sample, StoreSettings, TimeSeriesStore}

/** Scale probe for the LEDGER-PRUNED change feed (round 15): stage a
  * store with N partitions, mutate a FIXED number of them inside the
  * probe window, and time `changesBetween` at N and 10N. Under the
  * round-14 implementation (two whole-store snapshot scans) the diff
  * grew with N; under the ledger-pruned plan it must track CHURN — the
  * 10N run's scanned-dir count stays at the churn size and the wall
  * time stays flat. This is the corpus-proportional-growth probe the
  * r14 verdict noted the slice-bounded registry staging cannot give.
  *
  * Usage: runMain graft.examples.ChangeFeedProbe [basePartitions]
  */
object ChangeFeedProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = if (args.nonEmpty) args(0).toInt else 360
    println(f"${"partitions"}%10s ${"churned"}%8s ${"dirsScanned"}%12s " +
      f"${"dirsTotal"}%10s ${"diff_s"}%8s ${"rows"}%6s")
    Seq(base, base * 10).foreach { n => runOnce(spark, n) }
    spark.stop()
  }

  private def runOnce(spark: SparkSession, nPartitions: Int): Unit = {
    val root = Files.createTempDirectory(s"graft-cdfprobe$nPartitions").toString
    val st = new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = 100L), obsoleteGraceMs = 1L << 60)
    st.initialize()
    st.clock = () => 1000L
    // one tag per partition window, 20 rows each — N partition dirs
    val rows = (0 until nPartitions).flatMap { p =>
      (0 until 20).map(i => Sample(s"t$p", p * 100L + i, s"v$i", 1000L,
        "w1", p * 100L + i))
    }
    rows.grouped(2000).foreach(st.writeSamples(_))
    st.flushL0()
    // fixed churn: mutate 8 partitions inside the window, whatever N is
    st.clock = () => 2000L
    st.delete("t3", 300L, 305L)
    st.clock = () => 3000L
    val upd = (0 until 8).flatMap { k =>
      (0 until 5).map(i => Sample(s"t$k", k * 100L + i, s"u$i", 3000L,
        "w2", 100000L + k * 100L + i))
    }
    st.writeSamples(upd)
    st.flushL0()
    val plan = st.changeScanPlan(1500L, 3500L,
      graft.tsdb.GcLedger.retirementClocks(
        java.nio.file.Paths.get(st.namespaceRoot, "gc")))
    val t0 = System.nanoTime()
    val cnt = st.changesBetween(1500L, 3500L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$nPartitions%10d ${8}%8d ${plan.dirsScanned}%12d " +
      f"${plan.dirsTotal}%10d $secs%8.2f $cnt%6d")
  }
}
