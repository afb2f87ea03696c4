package graft.expressions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them alongside the Column API
  * (graft.functions.VectorFunctions.dotQF):
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT quantized_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot",
      exprs => {
        require(exprs.length == 2, "quantized_dot(a, b) takes exactly 2 arguments")
        QuantizedDotProduct(exprs.head, exprs(1))
      },
      "scala_udf")
  }
}
