package graft.examples

import org.apache.spark.sql.SparkSession

/** Micro-profiler for individual registry queries: runs a named query N
  * times at a given SF and prints per-run wall time.
  * Run: sbt 'runMain graft.examples.PerfProbe <query> [sfDir] [runs]'
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: PerfProbe <query> [sfDir] [runs]  — queries: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
