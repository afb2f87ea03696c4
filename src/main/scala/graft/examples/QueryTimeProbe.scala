package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry

/** Dev-time single-query bench probe (optimization guide §1: measure the
  * one thing you are about to change, in isolation). Mirrors Bench.scala's
  * methodology exactly — one untimed warm-up (JIT + codegen + staging
  * memos), clearCache, best-of-2 timed `count()` — and additionally counts
  * Spark jobs / stages / tasks per timed run via a listener, because at
  * bench scale (sf0.1, 2 k vectors) the serve-style rows are fixed-
  * overhead-bound: the job/stage count IS the cost model.
  *
  * Usage: runMain graft.examples.QueryTimeProbe <q1,q2,...> [sfDir]
  * With SPARK_GRAFT_PLAN_DIR set, also dumps each query's
  * explain("formatted") to <dir>/<name>.txt (the plans/r17 evidence files).
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })

    val qmap = SparkEntry.queries.toMap
    names.foreach { name =>
      val fn = qmap.getOrElse(name,
        sys.error(s"unknown query: $name (registry has ${qmap.size})"))
      spark.sparkContext.setJobDescription(s"qprobe:$name")
      fn(spark, sfDir).count() // warm-up: JIT + codegen + staging memos
      planDir.foreach { d =>
        Files.createDirectories(Paths.get(d))
        val txt = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$d/$name.txt"), txt)
      }
      spark.catalog.clearCache()
      val runs = (0 until 2).map { _ =>
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val d = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (d, jobs, stages, tasks)
      }
      val best = runs.minBy(_._1)
      println(f"[qprobe] $name%-34s best=${best._1}%6.2fs " +
        f"jobs=${best._2}%3d stages=${best._3}%3d tasks=${best._4}%5d " +
        s"runs=${runs.map(r => f"${r._1}%.2f").mkString("/")}")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
