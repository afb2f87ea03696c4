package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Schema contract for the driver-regenerated testdata: `Tables.events`
  * must yield `ts_ms: LongType` in the data's Jan-2024 span no matter
  * which `ts` encoding the driver shipped (int64 raw / timestamp[us] /
  * timestamp_ntz). The driver has changed this encoding between rounds;
  * this suite fails loudly and locally the next time it does.
  */
class LoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-loader-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  private def newTempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tempDirs += p
    p.toString
  }

  override def afterAll(): Unit = {
    spark.stop()
    tempDirs.foreach { p =>
      import java.nio.file.{FileVisitResult, Path, SimpleFileVisitor}
      import java.nio.file.attribute.BasicFileAttributes
      if (Files.exists(p)) Files.walkFileTree(p, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
          Files.deleteIfExists(f); FileVisitResult.CONTINUE
        }
        override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
          Files.deleteIfExists(d); FileVisitResult.CONTINUE
        }
      })
    }
  }

  private val Jan1 = 1704067200000L // 2024-01-01T00:00:00Z
  private val Feb1 = 1706745600000L // 2024-02-01T00:00:00Z

  test("events loader yields ts_ms LongType with Jan-2024 bounds on all SF dirs") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val df = Tables.events(spark, s"/root/testdata/sf$sf")
      assert(df.schema("ts_ms").dataType === LongType, s"sf$sf ts_ms type")
      val r = df.agg(min("ts_ms"), max("ts_ms"), count(lit(1))).head()
      assert(r.getLong(2) > 0, s"sf$sf empty")
      assert(r.getLong(0) >= Jan1, s"sf$sf min ts_ms ${r.getLong(0)}")
      assert(r.getLong(1) < Feb1, s"sf$sf max ts_ms ${r.getLong(1)}")
    }
  }

  test("loader dispatches on every ts encoding the driver has shipped") {
    val base = Jan1 * 1000000L // nanos
    def check(dir: String): Unit = {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts_ms").dataType === LongType)
      val got = df.orderBy("ts_ms").select("ts_ms").collect().map(_.getLong(0))
      assert(got.toSeq === Seq(Jan1, Jan1 + 1000L, Jan1 + 2000L))
    }

    // raw int64 nanos (what TIMESTAMP(NANOS) reads as under the legacy conf)
    val longDir = newTempDir("graft-loader-long")
    spark.range(3)
      .select((lit(base) + col("id") * 1000000000L).as("ts"))
      .write.parquet(s"$longDir/events.parquet")
    check(longDir)

    // timestamp (what the current testdata's timestamp[us] reads as)
    val tsDir = newTempDir("graft-loader-ts")
    val tsDf = spark.range(3)
      .select(timestamp_millis(lit(Jan1) + col("id") * 1000L).as("ts"))
    assert(tsDf.schema("ts").dataType === TimestampType)
    tsDf.write.parquet(s"$tsDir/events.parquet")
    check(tsDir)

    // timestamp_ntz, interpreted as UTC wall-clock
    val ntzDir = newTempDir("graft-loader-ntz")
    val ntzDf = spark.range(3)
      .select(to_timestamp_ntz(
        date_format(timestamp_millis(lit(Jan1) + col("id") * 1000L),
          "yyyy-MM-dd HH:mm:ss")).as("ts"))
    assert(ntzDf.schema("ts").dataType === TimestampNTZType)
    ntzDf.write.parquet(s"$ntzDir/events.parquet")
    check(ntzDir)
  }

  test("ntz ts_ms derivation is session-timezone independent") {
    val dir = newTempDir("graft-loader-ntz-tz")
    val ntzDf = spark.range(3)
      .select(to_timestamp_ntz(
        date_format(timestamp_millis(lit(Jan1) + col("id") * 1000L),
          "yyyy-MM-dd HH:mm:ss")).as("ts"))
    ntzDf.write.parquet(s"$dir/events.parquet")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = Tables.events(spark, dir)
        .orderBy("ts_ms").select("ts_ms").collect().map(_.getLong(0))
      assert(got.toSeq === Seq(Jan1, Jan1 + 1000L, Jan1 + 2000L),
        "ts_ms shifted under a non-UTC session timezone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("current testdata reads as a timestamp type, not legacy int64") {
    val t = Tables.eventsRaw(spark, "/root/testdata/sf0.001").schema("ts").dataType
    assert(t === TimestampType || t === TimestampNTZType, s"got $t")
  }

  test("driver table schemas carry every column the registry depends on") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, StringType}
    val sf = "/root/testdata/sf0.001"
    def cols(name: String) = Tables.load(spark, sf, name).schema

    val docs = cols("documents")
    for (c <- Seq("doc_id", "text", "lang", "source", "n_chars"))
      assert(docs.fieldNames.contains(c), s"documents.$c missing")
    assert(docs("text").dataType === StringType)

    val emb = cols("embeddings")
    for (c <- Seq("vec_id", "embedding", "label"))
      assert(emb.fieldNames.contains(c), s"embeddings.$c missing")
    assert(emb("embedding").dataType.isInstanceOf[ArrayType], "embedding not an array")
    val elem = emb("embedding").dataType.asInstanceOf[ArrayType].elementType
    assert(elem === FloatType || elem === DoubleType, s"embedding element $elem")

    val ev = Tables.events(spark, sf).schema
    for (c <- Seq("event_id", "user_id", "event_type", "value", "props", "ts_ms"))
      assert(ev.fieldNames.contains(c), s"events.$c missing")
    assert(ev("value").dataType === DoubleType)

    for ((t, key) <- Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
        "customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey", "nation" -> "n_nationkey",
        "region" -> "r_regionkey"))
      assert(cols(t).fieldNames.contains(key), s"$t.$key missing")
  }
}
