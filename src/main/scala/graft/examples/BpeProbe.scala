package graft.examples

import graft.Tables
import org.apache.spark.sql.SparkSession
object BpeProbe {
  def main(a: Array[String]): Unit = {
    val sf = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.analytics.TextAnalysis.bpeTelemetry = true
    val mode = if (a.length > 1) a(1) else "scaled"
    val t0 = System.nanoTime()
    val n = mode match {
      case "deep" => graft.analytics.TextAnalysis.bpeTrainDeep(
        Tables.documents(spark, sf), targetMerges = 1024, batchM = 16, poolK = 96).count()
      case "deep4k" =>
        // the restartable registered-row drive (round 16): sittings of
        // 64 rounds to 4096 rules or supply exhaustion
        val root = java.nio.file.Files.createTempDirectory("bpe4k").toString
        var done = false
        var sittings = 0
        while (!done && sittings < 128) {
          done = graft.analytics.TextAnalysis.bpeTrainDeepRestartable(
            Tables.documents(spark, sf), root, targetMerges = 4096,
            batchM = 16, poolK = 96, roundsPerSitting = 64)._2
          sittings += 1
        }
        val rules = graft.analytics.TextAnalysis.loadBpeRules(spark, root)
        val rounds = rules.agg(org.apache.spark.sql.functions.max("round"))
          .head.getLong(0)
        println(s"[bpeprobe] deep4k sittings=$sittings rounds=$rounds " +
          s"exhausted=${java.nio.file.Files.exists(
            java.nio.file.Paths.get(root, "exhausted"))}")
        rules.count()
      case _ => graft.analytics.TextAnalysis.bpeTrainScaled(
        Tables.documents(spark, sf), targetMerges = 256, batchM = 8, poolK = 48).count()
    }
    val total = (System.nanoTime() - t0) / 1e9
    println(s"[bpeprobe] sf=$sf rules=$n total=${"%.1f".format(total)}s")
    graft.analytics.TextAnalysis.lastRoundCosts.foreach { case (r, m, pv, s) =>
      println(s"[bpeprobe] round=$r merges=$m pair_rows=$pv sec=" + "%.2f".format(s))
    }
    spark.stop()
  }
}
