package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.RestFacade
import graft.tsdb.{StoreSettings, TimeSeriesStore}

/** REST facade parity spec (reference service.js:22-54): /set and /get
  * round-trip the reference's request/response shapes over real HTTP.
  */
class RestFacadeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rest-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def post(url: String, body: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val status = conn.getResponseCode
    val is = if (status < 400) conn.getInputStream else conn.getErrorStream
    val out = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (status, out)
  }

  test("/set then /get round-trips values (strings, numbers, objects)") {
    val store = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-rest").toString,
      StoreSettings(partitionWidth = 5L))
    store.initialize()
    val f = new RestFacade(store).start()
    try {
      val base = s"http://127.0.0.1:${f.boundPort}"
      val (s1, r1) = post(s"$base/set",
        """{"RTag":{"1":"one","2":5,"10":{"nested":true}}}""")
      assert(s1 === 200)
      assert(r1.matches("\"\\d+\"")) // store-size signal as a JSON string
      val (s2, r2) = post(s"$base/get", """{"RTag":{"start":0,"end":50}}""")
      assert(s2 === 200, r2)
      assert(r2 === """{"RTag":{"1":"one","2":5,"10":{"nested":true}}}""")
      // upsert via HTTP, LWW visible on next read
      post(s"$base/set", """{"RTag":{"1":"one-v2"}}""")
      val (_, r3) = post(s"$base/get", """{"RTag":{"start":1,"end":1}}""")
      assert(r3 === """{"RTag":{"1":"one-v2"}}""")
    } finally f.stop()
  }

  test("validation failures surface the reference's golden error messages as 500") {
    val store = new TimeSeriesStore(spark,
      Files.createTempDirectory("graft-rest2").toString,
      StoreSettings(partitionWidth = 5L))
    store.initialize()
    val f = new RestFacade(store).start()
    try {
      val base = s"http://127.0.0.1:${f.boundPort}"
      val (s1, r1) = post(s"$base/set", """{}""")
      assert(s1 === 500)
      assert(r1.contains("should contain atleast one item to insert"))
      val (s2, r2) = post(s"$base/get", """{"T":{"start":10,"end":1}}""")
      assert(s2 === 500)
      assert(r2.contains("start should be smaller than end"))
    } finally f.stop()
  }
}
