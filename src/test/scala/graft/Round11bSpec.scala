package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-11 (second batch) contracts:
  *  - the RAG chunker's boundary arithmetic — chunk counts, full coverage
  *    to the last token, the overlap region, and driver-recomputed chunk
  *    hashes on exact boundary lengths (n < w, n = w, n = w+1, n = w+s,
  *    n = w+s+1);
  *  - the incremental-MV algebra — partial merge is associative and
  *    merge ≡ recompute entirely inside Spark (the DuckDB oracle proves
  *    it against a second engine; this pins it against the engine's own
  *    full-data aggregate);
  *  - stream/batch parity for the three new twins (st_chunk, st_mv_merge,
  *    st_embedding_drift) — the streamed result equals the batch row's,
  *    row for row, on the same inputs;
  *  - the hybrid convenience wrapper ([[analytics.Similarity.hybridSearch]])
  *    equals the staged two-index probe it documents itself as
  *    shorthand for (ADVICE r10: no unreachable public API).
  */
class Round11bSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round11b-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkOverlap: counts, coverage, overlap, hashes on boundary lengths") {
    import spark.implicits._
    def toks(n: Int): Vector[String] = (1 to n).map(i => s"w$i").toVector
    val lens = Seq(5, 16, 17, 28, 29)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, toks(n).mkString(" ")) }
      .toDF("doc_id", "text")
    val out = analytics.TextAnalysis.chunkOverlap(docs, window = 16, stride = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
    val expectCounts = Seq(1, 1, 2, 2, 3)
    lens.zipWithIndex.foreach { case (n, i) =>
      val chunks = out(i.toLong).sortBy(_._2)
      assert(chunks.length == expectCounts(i),
        s"n=$n: expected ${expectCounts(i)} chunks, got ${chunks.length}")
      // chunk_id k starts at 12k; coverage reaches exactly the last token
      chunks.foreach { case (_, cid, start, _, _) => assert(start == 12 * cid) }
      assert(chunks.map(c => c._3 + c._4).max == n.toLong,
        s"n=$n: final chunk must end at the last token")
      // every chunk is the expected slice — recompute the hash in the driver
      chunks.foreach { case (_, _, start, len, hash) =>
        val expected = toks(n).slice(start.toInt, start.toInt + len.toInt)
        assert(len == math.min(16, n - start).toLong)
        assert(hash == md5hex(expected.mkString(" ")))
      }
      // consecutive chunks overlap by EXACTLY window − stride = 4 tokens
      // when the predecessor is full-width (an over-widened chunk would
      // pass a ≥ check); only a partial tail predecessor may overlap more
      chunks.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (_, _, s1, l1, _) = pair(0)
          val (_, _, s2, _, _) = pair(1)
          if (l1 == 16L)
            assert(s1 + l1 - s2 == 4, s"n=$n: full-width chunks must overlap by exactly 4")
          else
            assert(s1 + l1 - s2 >= 4, s"n=$n: chunks must overlap by ≥ 4 tokens")
        }
      }
    }
  }

  test("incremental MV: partial merge is associative and ≡ recompute in-engine") {
    val Q = queries.RelationalQueries
    val orders = Tables.orders(spark, sf)
    val full = Q.mvFinalize(Q.mvPartials(spark, sf, orders))
    val parts = (0L to 2L).map(r =>
      Q.mvPartials(spark, sf, orders.where(pmod(col("o_orderkey"), lit(3L)) === r)))
    val leftFold = Q.mvFinalize(
      Q.mvMergePartials(Q.mvMergePartials(parts(0), parts(1)), parts(2)))
    val rightFold = Q.mvFinalize(
      Q.mvMergePartials(parts(0), Q.mvMergePartials(parts(1), parts(2))))
    val expected = sortedRows(full)
    assert(expected.nonEmpty)
    assert(sortedRows(leftFold) == expected, "left-fold merge must ≡ recompute")
    assert(sortedRows(rightFold) == expected, "merge must be associative")
  }

  test("st_mv_merge equals the batch incremental-MV row (stream/batch parity)") {
    val batch = SparkEntry.queries("rel_mv_incremental")(spark, sf)
    val stream = SparkEntry.queries("st_mv_merge")(spark, sf)
    val b = sortedRows(batch)
    assert(b.nonEmpty)
    assert(sortedRows(stream) == b)
  }

  test("st_chunk equals the batch chunker (stream/batch parity)") {
    val batch = SparkEntry.queries("tx_chunk_overlap")(spark, sf)
    val stream = SparkEntry.queries("st_chunk")(spark, sf)
    val b = sortedRows(batch)
    assert(b.nonEmpty)
    assert(sortedRows(stream) == b)
  }

  test("st_embedding_drift equals the batch drift monitor (stream/batch parity)") {
    val batch = SparkEntry.queries("sim_embedding_drift")(spark, sf)
    val stream = SparkEntry.queries("st_embedding_drift")(spark, sf)
    val b = sortedRows(batch)
    assert(b.nonEmpty)
    assert(sortedRows(stream) == b)
  }

  test("hybridSearch wrapper equals the staged two-index probe") {
    val docs = Tables.documents(spark, sf)
    val vecArm = analytics.Similarity
      .bruteForceTopK(Tables.embeddings(spark, sf), k = 10, queryModulo = 20)
    val viaWrapper = analytics.Similarity.hybridSearch(docs, vecArm)
    val viaStaged = analytics.Similarity.hybridProbeIndexed(
      docs.where(col("doc_id") % 20 === 0).select(col("doc_id").as("query_id")),
      analytics.Similarity.lexIndex(docs), vecArm)
    val w = sortedRows(viaWrapper)
    assert(w.nonEmpty)
    assert(w == sortedRows(viaStaged))
  }
}
