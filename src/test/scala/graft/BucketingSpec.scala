package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Co-located joins via bucketing — the scale technique for repeated joins
  * on the same key (100 TB design note: bucket the hot fact tables on
  * their join key once at write time; every subsequent join skips both
  * shuffles).
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join with zero exchanges; unbucketed join shuffles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.select("event_id", "user_id", "value").write
      .bucketBy(8, "user_id").sortBy("user_id")
      .format("parquet").mode("overwrite").saveAsTable("bk_events_a")
    ev.select("event_id", "user_id", "event_type").write
      .bucketBy(8, "user_id").sortBy("user_id")
      .format("parquet").mode("overwrite").saveAsTable("bk_events_b")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so the exchange behavior is observable
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // join key must equal the bucket spec for the planner to use it
      val bucketed = spark.table("bk_events_a")
        .join(spark.table("bk_events_b"), Seq("user_id"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$bucketedPlan")
      assert(bucketed.count() > 0)
      val unbucketed = ev.select("event_id", "user_id", "value")
        .join(ev.select("event_id", "user_id", "event_type").withColumnRenamed("event_id", "eb"),
          Seq("user_id"))
      val unbucketedPlan = unbucketed.queryExecution.executedPlan.toString
      assert(unbucketedPlan.contains("Exchange"),
        "control: the unbucketed join is expected to shuffle")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bk_events_a")
      spark.sql("DROP TABLE IF EXISTS bk_events_b")
    }
  }
}
