package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash kernels.
  *
  * The relational construction (64 conditional-sum aggregate expressions
  * over `substring(md5(w), j, 1)` probes) allocates 64 single-char
  * UTF8Strings per token row inside the aggregate update path. These two
  * operators compute the same function with two MD5 calls and integer bit
  * ops per token:
  *
  *  - [[Md5BitParity]]: token → packed 64-bit parity word. Bit `64-j`
  *    (1-based char index `j`) = `ascii(substr(md5(w),j,1)) % 2` for
  *    j ≤ 32 and `ascii(substr(md5('x'||w), j-32, 1)) % 2` for j > 32 —
  *    EXACTLY the oracle's definition (hex digit d: ascii = 48+d below 10,
  *    87+d above, so parity = d%2 below 10 and (d+1)%2 above).
  *  - [[SimhashBitCounts]]: aggregates ±1 per bit into 64 counters and
  *    emits the packed `(fp_hi, fp_lo)` fingerprint halves (count > 0 →
  *    bit set), identical packing to the declarative form.
  *
  * Supports partial aggregation (map-side combine): the 64-counter buffer
  * merges associatively, so the shuffle moves one 256-byte buffer per
  * (partition, doc) — the same scale shape as the sum-expression form.
  */
object SimhashUtil {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def parityBitsOf(digest: Array[Byte]): Long = {
    // 32 hex chars; char index c (0-based) = nibble c of the digest.
    // parity(d) = d%2 for d<10 ('0'-'9' = 48+d), (d+1)%2 for d>=10
    // ('a'-'f' = 87+d).
    var bits = 0L
    var c = 0
    while (c < 32) {
      val b = digest(c >> 1) & 0xff
      val d = if ((c & 1) == 0) b >>> 4 else b & 0xf
      val parity = (if (d < 10) d else d + 1) & 1
      bits = (bits << 1) | parity
      c += 1
    }
    bits
  }

  /** Packed parity word: bits 63..32 = chars 1..32 of md5(w), bits 31..0 =
    * chars 1..32 of md5('x' || w).
    */
  def pack(w: UTF8String): Long = {
    val md = md5Local.get()
    val wb = w.getBytes
    md.reset()
    val h1 = parityBitsOf(md.digest(wb))
    md.reset()
    val xb = new Array[Byte](wb.length + 1)
    xb(0) = 'x'
    System.arraycopy(wb, 0, xb, 1, wb.length)
    val h2 = parityBitsOf(md.digest(xb))
    (h1 << 32) | h2
  }
}

/** token → packed 64-bit md5-hex-parity word (see [[SimhashUtil.pack]]). */
case class Md5BitParity(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_bit_parity expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimhashUtil.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimhashUtil.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_bit_parity"
}

/** Aggregate: per-bit ±1 counts over packed parity words → packed
  * `struct(fp_hi, fp_lo)` SimHash fingerprint (bit j of 32 set iff the
  * bit's running sum is positive — ties (0) are clear, matching
  * `sum > 0` in the declarative form).
  */
case class SimhashBitCounts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("fp_hi", LongType, nullable = false),
    StructField("fp_lo", LongType, nullable = false)))

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val p = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buffer(j) += (if (((p >>> (63 - j)) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buffer: Array[Int]): Any = {
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 32) {
      if (buffer(j) > 0) hi |= 1L << (31 - j)
      if (buffer(j + 32) > 0) lo |= 1L << (31 - j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hi, lo))
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashBitCounts =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimhashBitCounts =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_bit_counts"
}
