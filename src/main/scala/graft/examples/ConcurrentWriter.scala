package graft.examples

import org.apache.spark.sql.SparkSession

import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** Child-JVM worker for the CROSS-PROCESS store contract (VERDICT r12
  * next #9): the reference's HA claim is multiple stateless processes on
  * one Redis (reference README.md:4); this engine's analog is multiple
  * Spark driver JVMs on one store root, coordinated only through the
  * filesystem (writer-unique L0/activity files, the [[graft.tsdb.MaintenanceLease]],
  * the cross-process change stamp, and the obsolete-file grace ledger).
  * Round13Spec launches this main in SEPARATE JVMs — same classpath,
  * fresh SparkSession, nothing shared in memory — while the test JVM
  * reads and runs its own maintenance against the same root.
  *
  * Modes:
  *  - `writer <root> <width> <baseTs> <rounds> <rowsPerRound> <doneFile>`:
  *    deterministic reference-API ingest — round r writes rows
  *    `ts = baseTs + (r*rowsPerRound + i) * 1000`, tag `jvmK` (K = i%3),
  *    value `v<r>:<i>` via the plain `write` path (writer-unique L0
  *    files, NO lease — the coordination-free lane), then touches
  *    `doneFile` and exits.
  *  - `maintainer <root> <width> <stopFile> <doneFile>`: a maintenance
  *    loop (flush → compact → purge scan/archive/ack) every ~200 ms
  *    until `stopFile` appears — every operation contends for the
  *    maintenance lease with the test JVM's own maintenance.
  *
  * Both modes run with a 10 s obsolete-file grace: a reader's resolved
  * listing is guaranteed for the grace after any listed file goes
  * obsolete, so the grace must exceed the OTHER process's slowest
  * resolve→execute span (the snapshot-retention sizing rule).
  */
object ConcurrentWriter {

  private def store(spark: SparkSession, root: String, width: Long) =
    new TimeSeriesStore(spark, root,
      StoreSettings(partitionWidth = width),
      obsoleteGraceMs = 10000L)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-concurrent-${args.headOption.getOrElse("worker")}")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      args.toList match {
        case "writer" :: root :: width :: baseTs :: rounds :: rpr :: done :: Nil =>
          writerLoop(spark, root, width.toLong, baseTs.toLong,
            rounds.toInt, rpr.toInt, done)
        case "maintainer" :: root :: width :: stop :: done :: Nil =>
          maintainerLoop(spark, root, width.toLong, stop, done)
        case other =>
          sys.error(s"unknown args: $other")
      }
    } finally spark.stop()
  }

  private def writerLoop(spark: SparkSession, root: String, width: Long,
      baseTs: Long, rounds: Int, rowsPerRound: Int, done: String): Unit = {
    val st = store(spark, root, width)
    st.initialize() // adopts the shared epoch (SET-NX semantics)
    for (r <- 0 until rounds) {
      val rows = (0 until rowsPerRound).map { i =>
        val k = r * rowsPerRound + i
        (s"jvm${i % 3}", baseTs + k * 1000L, s"v$r:$i")
      }
      st.write(rows.groupBy(_._1).map { case (tag, ts) =>
        tag -> ts.map(t => t._2 -> t._3).toMap
      })
      Thread.sleep(50)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(done),
      Array.emptyByteArray)
  }

  private def maintainerLoop(spark: SparkSession, root: String, width: Long,
      stop: String, done: String): Unit = {
    val st = store(spark, root, width)
    st.initialize()
    val stopPath = java.nio.file.Paths.get(stop)
    var cycles = 0
    while (!java.nio.file.Files.exists(stopPath)) {
      st.flushL0()
      st.compact(minFiles = 2, applyLww = true)
      // tier, never drop: archive BEFORE ack so hot ∪ cold keeps every row
      val ids = st.purgeScan(partitionAgeThreshold = 1, maxPartitionsToMark = 2)
      ids.foreach { id =>
        st.loadPurgeEntry(id).foreach { e =>
          st.archiveToCold(id)
          st.purgeAck(id, e.partitionName, e.tag)
        }
      }
      cycles += 1
      Thread.sleep(200)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(done),
      s"cycles=$cycles".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
