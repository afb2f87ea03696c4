package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them alongside the Column API
  * (graft.functions.VectorFunctions.dotQF):
  *
  * {{{
  *   GraftFunctions.register(spark)                   // imperative
  *   // or: spark.sql.extensions=graft.expressions.GraftExtensions
  *   spark.sql("SELECT quantized_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object GraftFunctions {

  /** (name, usage, builder) for every native function the engine ships. */
  val descriptors: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("quantized_dot",
      "quantized_dot(a, b) - exact integer dot product of quantized float vectors",
      exprs => {
        require(exprs.length == 2, "quantized_dot(a, b) takes exactly 2 arguments")
        QuantizedDotProduct(exprs.head, exprs(1))
      }),
    ("md5_bit_parity",
      "md5_bit_parity(w) - packed 64-bit md5-hex-char parity word of a token",
      exprs => {
        require(exprs.length == 1, "md5_bit_parity(w) takes exactly 1 argument")
        Md5BitParity(exprs.head)
      }),
    ("simhash_fingerprint",
      "simhash_fingerprint(parity_word) - aggregate packed parity words into (fp_hi, fp_lo)",
      exprs => {
        require(exprs.length == 1, "simhash_fingerprint(pb) takes exactly 1 argument")
        SimhashBitCounts(exprs.head).toAggregateExpression()
      }))

  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point — the idiomatic zero-code way to add
  * the engine's native SQL functions AND its planner strategies (the
  * sort-merge as-of join operator) to every session of an application:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.expressions.GraftExtensions ...
  * }}}
  *
  * ([[graft.plans.NativeAsOfJoin]] also self-registers its strategy at
  * call time via `experimental.extraStrategies`, so sessions built without
  * the config still plan it.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expressions.GraftFunctions", null, name, usage, ""),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
