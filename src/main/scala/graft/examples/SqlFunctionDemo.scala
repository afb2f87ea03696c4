package graft.examples

import org.apache.spark.sql.SparkSession

/** Drive the registered SQL surface: quantized_dot from plain spark.sql.
  * Run: `sbt "runMain graft.examples.SqlFunctionDemo"`
  */
object SqlFunctionDemo {
  def main(args: Array[String]): Unit = {
    // functions arrive via the config-driven extensions hook — no
    // imperative register() call anywhere in this main
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("embeddings")
    val top = spark.sql("""
      SELECT a.vec_id, quantized_dot(a.embedding, b.embedding) AS dot
      FROM embeddings a JOIN embeddings b ON b.vec_id = 42
      WHERE a.vec_id <> 42
      ORDER BY dot DESC LIMIT 3""").collect()
    println(s"[demo] top-3 by quantized_dot vs vec 42: ${top.map(r => (r.getLong(0), r.getLong(1))).mkString(", ")}")
    // probe: wrong arity
    try { spark.sql("SELECT quantized_dot(embedding) FROM embeddings LIMIT 1").collect() }
    catch { case e: Exception => println(s"[demo] arity error surfaced: ${e.getMessage.linesIterator.next()}") }
    // probe: wrong type
    try { spark.sql("SELECT quantized_dot(vec_id, vec_id) FROM embeddings LIMIT 1").collect() }
    catch { case e: Exception => println(s"[demo] type error surfaced: ${e.getMessage.linesIterator.next()}") }
    // the simhash kernels through plain SQL (also injected by extensions)
    val fp = spark.sql("""
      SELECT fp.fp_hi AS hi, fp.fp_lo AS lo FROM (
        SELECT simhash_fingerprint(md5_bit_parity(w)) AS fp
        FROM (SELECT explode(array('the','quick','fox')) AS w))""").collect()(0)
    println(s"[demo] simhash_fingerprint via SQL: hi=${fp.getLong(0)} lo=${fp.getLong(1)}")
    spark.stop()
  }
}
