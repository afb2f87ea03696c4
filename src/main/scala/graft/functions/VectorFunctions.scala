package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * Exact-arithmetic discipline: vectors are quantized to integers
  * (`round(x * 10000)` as BIGINT) before any reduction, so dot products and
  * norms are order-independent exact integers and every engine computes the
  * same cosine double. Raw float accumulation would be reduction-order
  * dependent and can't hash-match an oracle.
  *
  * All ops are codegen'd `functions._` compositions (zip_with/aggregate);
  * for the 100 TB path the same expressions run inside whole-stage codegen
  * per partition — no UDF boxing, no driver collection.
  */
object VectorFunctions {

  /** Quantize `array<float>` → `array<long>` at 4 decimal places. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 10000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared norm. */
  def normSqQ(v: Column): Column = dotQ(v, v)

  /** Cosine similarity from quantized ints — deterministic double. */
  def cosineQ(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))
}
