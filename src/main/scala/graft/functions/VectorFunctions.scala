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

  /** Quantize `array<float>` → `array<long>`: floor(x·10⁴ + ½) — identical
    * IEEE double semantics in Spark, generated Java, and DuckDB (`round()`
    * would route through engine-specific decimal paths).
    */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 10000 + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors (declarative HOF
    * form — interpreted; prefer [[dotQF]] on hot paths).
    */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Codegen'd quantize+dot over the raw `array<float>` columns — the
    * native-Expression fast path (graft.expressions.QuantizedDotProduct),
    * ~30× the HOF form on the ANN benchmark.
    */
  def dotQF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.QuantizedDotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Codegen'd squared norm of the raw `array<float>` column. */
  def normSqQF(v: Column): Column = dotQF(v, v)

  /** Codegen'd exact dot of two ALREADY-quantized `array<long>` columns
    * (k-means centroids are integer means that never existed as floats).
    */
  def dotLL(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.LongDotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Exact integer squared norm (HOF form). */
  def normSqQ(v: Column): Column = dotQ(v, v)

  /** Codegen'd quantize `array<float>` → `array<long>` — the native form
    * of [[quantize]]. HOFs are codegen-opaque: one `transform` in a
    * projection evicts the WHOLE projection (and every kernel in it) from
    * whole-stage codegen, so hot paths use this.
    */
  def quantizeF(v: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.QuantizeVector(
        org.apache.spark.sql.graft.ColumnBridge.expression(v)))

  /** Codegen'd nearest-centroid assignment over a driver-constant centroid
    * table (rows of `(c_id, cv, cnrmSq)`, k·dim longs shipped as
    * expression reference state): argmax cosine, ties to the smallest
    * `c_id` — bit-identical to the retired `crossJoin + max(struct)` form
    * and to the SQL oracles, but a pure narrow projection (no join, no
    * sort-aggregate, no shuffle).
    */
  def nearestCentroid(vec: Column, nrmSq: Column,
      cents: Array[(Long, Array[Long], Long)]): Column = {
    val sorted = cents.sortBy(_._1)
    val nc = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.NearestCentroid(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        org.apache.spark.sql.graft.ColumnBridge.expression(nrmSq),
        sorted.map(_._1), sorted.map(_._2), sorted.map(_._3)))
    // Non-nullable wrapper: the bucket id is a JOIN KEY downstream, and a
    // nullable key makes InferFiltersFromConstraints push
    // isnotnull(nearest_centroid(...)) below the projection — recomputing
    // the whole k·dim argmax PER ROW in a filter just to test nullness
    // (observed in the round-8 plan audit). Null inputs (never present in
    // the data contract) land in a sentinel bucket instead.
    coalesce(nc, lit(Long.MinValue))
  }

  /** Codegen'd single-pass LSH bucket id of a raw `array<float>` vector
    * (sign bits of `nPlanes` fixed ±1 hyperplane projections over the
    * quantized components, packed into one long) — the projection form of
    * the exploded SQL bucketing, zero exchanges.
    */
  def lshBucketF(v: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    // coalesce: same join-key non-nullability rationale as
    // [[nearestCentroid]] — keeps isnotnull(lsh_bucket(...)) from being
    // re-evaluated per row in a pushed-down constraint filter
    coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.LshBucket(
          org.apache.spark.sql.graft.ColumnBridge.expression(v), nPlanes,
          planeOffset)),
      lit(Long.MinValue))

  /** Cosine similarity from quantized ints — deterministic double. */
  def cosineQ(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))
}
