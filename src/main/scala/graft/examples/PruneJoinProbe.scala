package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the ts_dsv2_runtime_prune join-path cost (round 8):
  * prints the executed plan's scan node, the connector's custom metrics
  * (dirsKept/dirsTotal, filesOpened), and per-stage timing so the ~2.8 s
  * join-path overhead (vs 0.26 s static prune) is attributable.
  */
object PruneJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    graft.queries.StoreQueries.storeFor(spark, sfDir) // stage once, untimed
    def dpp() = graft.SparkEntry.queries("ts_dsv2_runtime_prune")(spark, sfDir)

    val q = dpp()
    q.collect() // warm
    val t0 = System.nanoTime()
    val q2 = dpp()
    q2.collect()
    println(f"timed=${(System.nanoTime() - t0) / 1e9}%.2f")
    val plan = q2.queryExecution.executedPlan
    // walk the adaptive plan for scan nodes + their metrics
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan)
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          println("SCAN " + s.simpleString(250))
          s.metrics.toSeq.sortBy(_._1).foreach { case (k, m) =>
            println(f"  metric $k = ${m.value}")
          }
        case other => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    println(spark.sparkContext.statusTracker.getExecutorInfos.length + " executors")
    spark.stop()
  }
}
