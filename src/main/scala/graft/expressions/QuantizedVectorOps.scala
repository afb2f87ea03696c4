package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd quantized dot product of two `array<float>` embedding columns.
  *
  * Semantics (must stay bit-identical to the SQL/DuckDB oracle form):
  * each element is quantized `floor(x * 10000 + 0.5)` in double precision,
  * the products are summed as exact Longs. Equivalent declarative form:
  * `aggregate(zip_with(qa, qb, (x,y) -> x*y), 0L, +)` — but Catalyst
  * higher-order functions run interpreted (per-row closure dispatch plus
  * per-element boxing), which measured ~30× slower on the ANN benchmark.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen instead.
  *
  * Usage: [[graft.functions.VectorFunctions.dotQF]].
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantized_dot expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val qx = math.floor(xs.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      val qy = math.floor(ys.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      acc += qx * qy
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qx = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
         |  long $qy = (long) java.lang.Math.floor(((double) $b.getFloat($i)) * 10000.0 + 0.5);
         |  ${ev.value}Acc += $qx * $qy;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_dot"
}

/** Codegen'd exact dot product of two `array<long>` columns — the
  * companion of [[QuantizedDotProduct]] for vectors that are ALREADY
  * quantized (e.g. k-means centroids, which are integer means of
  * quantized components and never existed as floats). Same tight
  * primitive loop inside whole-stage codegen; the declarative
  * `aggregate(zip_with(...))` form runs interpreted.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_dot expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}

/** Codegen'd vector quantization: `array<float>` → `array<long>` via
  * `floor(x·10⁴ + ½)` per element — the native-Expression form of
  * [[graft.functions.VectorFunctions.quantize]]'s HOF `transform`.
  *
  * Why it exists (round 8): Catalyst higher-order functions do not
  * support codegen, so ANY projection containing the HOF form is evicted
  * from whole-stage codegen — taking every OTHER expression in that
  * projection (including the dot kernels) to interpreted mode with it.
  * The k-means prep projection was exactly this case.
  */
case class QuantizeVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vec expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(xs.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $a.numElements();
         |long[] $arr = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_vec"
}

/** Codegen'd nearest-centroid assignment: for a quantized vector (plus its
  * precomputed squared norm), the `c_id` of the argmax-cosine centroid from
  * a DRIVER-CONSTANT centroid table (k·dim longs, shipped to executors in
  * the expression's reference objects — the broadcast-small-state shape).
  *
  * Replaces the `crossJoin(broadcast(centroids)) + max(struct(...))`
  * assignment: that struct carries the vector ARRAY through the aggregate
  * buffer, which makes the buffer non-mutable, forces `SortAggregateExec`
  * (a full sort of the corpus×k cross join, interpreted aggregate eval),
  * and costs two exchanges. This form is a pure narrow projection inside
  * whole-stage codegen — no join, no sort, no shuffle.
  *
  * Tie-break contract (must stay bit-identical to the oracle and the
  * retired struct-max form): compare cosine doubles with
  * `java.lang.Double.compare` (NaN greatest — Spark's double ordering),
  * equal cosines pick the SMALLEST `c_id`.
  */
case class NearestCentroid(vec: Expression, nrmSq: Expression,
    cids: Array[Long], cvs: Array[Array[Long]], cnrms: Array[Long])
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = nrmSq

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, nrmSq.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects (array<bigint>, bigint), got $other")
    }

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val qn = math.sqrt(nrm.asInstanceOf[Long].toDouble)
    var best = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var j = 0
    while (j < cids.length) {
      val c = cvs(j)
      val n = math.min(xs.numElements(), c.length)
      var dot = 0L
      var i = 0
      while (i < n) { dot += xs.getLong(i) * c(i); i += 1 }
      val cos = dot.toDouble / (qn * math.sqrt(cnrms(j).toDouble))
      val cmp = java.lang.Double.compare(cos, best)
      if (cmp > 0 || (cmp == 0 && cids(j) < bestId)) { best = cos; bestId = cids(j) }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val cvsRef = ctx.addReferenceObj("cvs", cvs, "long[][]")
    val cnrmsRef = ctx.addReferenceObj("cnrms", cnrms, "long[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val cmp = ctx.freshName("cmp")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val qn = ctx.freshName("qn")
      s"""
         |double $qn = java.lang.Math.sqrt((double) $nrm);
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |long $bestId = java.lang.Long.MAX_VALUE;
         |for (int $j = 0; $j < $cidsRef.length; $j++) {
         |  long[] $c = $cvsRef[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) { $dot += $v.getLong($i) * $c[$i]; }
         |  double $cos = ((double) $dot) / ($qn * java.lang.Math.sqrt((double) ${cnrmsRef}[$j]));
         |  int $cmp = java.lang.Double.compare($cos, $best);
         |  if ($cmp > 0 || ($cmp == 0 && $cidsRef[$j] < $bestId)) { $best = $cos; $bestId = $cidsRef[$j]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, nrmSq = newRight)

  override def prettyName: String = "nearest_centroid"
}

/** Codegen'd single-pass LSH bucketing of a raw `array<float>` embedding:
  * quantize each component once, accumulate the `nPlanes` signed
  * projections with the fixed ±1 coefficient pattern
  * `coef(i, g) = if ((i · m_g) mod 97 < 49) +1 else −1` where
  * `m_g = (13·(g+1)) mod 97` and `g = planeOffset + b` is the GLOBAL
  * plane index (1-based dim `i` — the SQL-expressible hyperplane family
  * the oracles recompute), and pack `proj_b >= 0` sign bits into one
  * long.
  *
  * '''Why mod 97''' (round 8): the previous family
  * `(i·(b+7)) mod 5 <= 2` repeats every 5 planes — planes 0/5, 1/6, 2/7
  * were DUPLICATES and plane 3 (`(b+7) ≡ 0 mod 5`) was constant +1, so
  * the "8-plane" hash carried ~4 informative bits and adding planes
  * could never shrink buckets (the corpus-adaptive granularity the
  * near-dup blocking needs). 97 is prime and `13·(g+1)` never hits 0
  * for `g < 96`, so all 64 addressable planes are distinct.
  *
  * `planeOffset` selects a disjoint plane range per LSH band (banded
  * OR-amplification, same construction as minhash banding).
  *
  * Replaces the `posexplode(quantize(v)) → groupBy(vec_id).agg(8
  * conditional sums)` form: that shuffles corpus×dim exploded rows to
  * reassemble per-vector sums the row already had locally. This is a pure
  * projection — zero exchanges for the bucketing stage.
  */
case class LshBucket(child: Expression, nPlanes: Int, planeOffset: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket expects array<float>, got ${other.simpleString}")
    }

  /** Per-plane ±1 pattern multipliers, distinct for every global plane. */
  private lazy val mults: Array[Long] =
    (0 until nPlanes).map(b => (13L * (planeOffset + b + 1)) % 97L).toArray

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sums = new Array[Long](nPlanes)
    var i = 0
    while (i < n) {
      val q = math.floor(xs.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      var b = 0
      while (b < nPlanes) {
        sums(b) += (if ((i + 1).toLong * mults(b) % 97 < 49) q else -q)
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nPlanes) { if (sums(b) >= 0L) bucket |= 1L << b; b += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val sums = ctx.freshName("sums")
      val bucket = ctx.freshName("bucket")
      val ms = ctx.freshName("mults")
      val multsRef = ctx.addReferenceObj("lshMults", mults, "long[]")
      s"""
         |int $n = $a.numElements();
         |long[] $ms = $multsRef;
         |long[] $sums = new long[$nPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
         |  for (int $b = 0; $b < $nPlanes; $b++) {
         |    $sums[$b] += ((((long) ($i + 1)) * $ms[$b]) % 97 < 49) ? $q : -$q;
         |  }
         |}
         |long $bucket = 0L;
         |for (int $b = 0; $b < $nPlanes; $b++) { if ($sums[$b] >= 0L) $bucket |= 1L << $b; }
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}

/** Codegen'd per-vector quantized-component stats — one pass over the raw
  * `array<float>`, emitting `struct<n_zero: bigint, max_abs_q: bigint>`
  * (count of zero quantized components, max absolute quantized value).
  *
  * Replaces the two `functions.aggregate` higher-order lambdas in the
  * vector-quality audit: HOFs are non-codegen expressions, and one in a
  * projection evicts the WHOLE projection (including the dot-product
  * kernels sharing it) from whole-stage codegen — the bench kernel audit
  * flagged `sim_vec_quality` as the one interpreted plan (round 8).
  */
case class QuantVecStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_zero", LongType, nullable = false),
    StructField("max_abs_q", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quant_vec_stats expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var zeros = 0L
    var maxAbs = 0L
    var i = 0
    while (i < n) {
      val q = math.floor(xs.getFloat(i).toDouble * 10000.0 + 0.5).toLong
      if (q == 0L) zeros += 1L
      val a = math.abs(q)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(zeros, maxAbs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val abs = ctx.freshName("abs")
      val zeros = ctx.freshName("zeros")
      val maxAbs = ctx.freshName("maxAbs")
      s"""
         |int $n = $a.numElements();
         |long $zeros = 0L;
         |long $maxAbs = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 10000.0 + 0.5);
         |  if ($q == 0L) $zeros++;
         |  long $abs = java.lang.Math.abs($q);
         |  if ($abs > $maxAbs) $maxAbs = $abs;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $zeros, $maxAbs });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quant_vec_stats"
}
