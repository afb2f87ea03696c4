package graft.examples

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkEntry

/** Global-window sweep (VERDICT r13 missing #6): run every registered
  * query with a listener capturing every executed plan — checkpointed
  * sub-jobs and staging included — and extract each UNPARTITIONED
  * WindowExec with its window expressions and nearest child node.
  * `GlobalWindowSpec` asserts every such site matches the ALLOWLIST of
  * named bounds; this main prints the raw sites for inspection.
  */
object GlobalWindowSweep {

  /** Top-level bracket groups of a plan line's `Window [..], [..]` tail. */
  def bracketGroups(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var cur = new StringBuilder
    var started = false
    s.foreach { c =>
      if (c == '[') {
        depth += 1
        if (depth == 1) { started = true; cur = new StringBuilder }
        else cur += c
      } else if (c == ']') {
        depth -= 1
        if (depth == 0 && started) out += cur.toString else cur += c
      } else if (depth >= 1) cur += c
    }
    out.toSeq
  }

  /** (window expressions, child context) of every GLOBAL (unpartitioned)
    * window in a plan's text. A Window line prints as
    * `Window [exprs], [partitionCols], [orderCols]` — 3 groups — when
    * partitioned AND ordered; partition-only windows print 2 groups
    * whose second group has NO sort markers; order-only (= GLOBAL)
    * windows print 2 groups whose second group carries ASC/DESC — the
    * shape this sweep hunts.
    */
  def globalWindows(planText: String): Seq[(String, String)] = {
    val lines = planText.linesIterator.toVector
    lines.zipWithIndex.collect {
      case (l, i) if l.contains("Window [") => (l, i)
    }.flatMap { case (l, i) =>
      val groups = bracketGroups(l.substring(l.indexOf("Window")))
      if (groups.size == 2 &&
          (groups(1).contains(" ASC") || groups(1).contains(" DESC")))
        Some((groups.head.take(200),
          lines.slice(i + 1, i + 4).map(_.trim.take(160)).mkString(" | ")))
      else None
    }
  }

  /** Run every registered query under the capture listener.
    * @return (queryName, windowExprs, childContext) per global window
    */
  def sweep(spark: SparkSession, sf: String): Seq[(String, String, String)] = {
    val hits = new ConcurrentLinkedQueue[(String, String, String)]()
    @volatile var current = "?"
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        globalWindows(qe.executedPlan.toString).foreach { case (w, ctx) =>
          hits.add((current, w, ctx)); ()
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        fn(spark, sf).collect()
        ()
      }
    finally {
      Thread.sleep(3000) // listener bus is async; let it drain
      spark.listenerManager.unregister(listener)
    }
    import scala.jdk.CollectionConverters._
    hits.asScala.toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val grouped = sweep(spark, sf).groupBy(h => (h._1, h._2.take(80)))
    println(s"[sweep] ${grouped.size} distinct (query, window) global-window sites")
    grouped.toSeq.sortBy(_._1).foreach { case ((q, w), hs) =>
      println(s"[sweep] $q :: ${hs.size}x :: $w")
      println(s"[sweep]    child: ${hs.head._3.take(220)}")
    }
    spark.stop()
  }
}
