package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.types._

/** From-scratch HyperLogLog as a native `TypedImperativeAggregate`
  * (SURVEY.md §7.3 option 2) — the engine-owned sketch path beside Spark's
  * built-in `approx_count_distinct`.
  *
  * Classic Flajolet–Fuss–Gandouet–Meunier HLL: 2^p byte registers; each
  * value hashes to (register ← top p bits, rank ← leading zeros of the
  * rest + 1); a register keeps its max rank; merge is byte-wise max. Since
  * max is associative and commutative the estimate is EXACTLY deterministic
  * under any partitioning or merge order — unlike a sum-of-doubles sketch.
  * Standard error ≈ 1.04/√(2^p) ≈ 2.3 % at the default p=11 (2 KiB/group).
  *
  * Partial aggregation works the usual way: executors pre-merge row groups
  * map-side, so the shuffle carries one 2 KiB buffer per (partition, group)
  * — at 100 TB the exchange volume is group-cardinality-bound, independent
  * of row count.
  *
  * Input is LongType (callers cast/hash other types first — see
  * `hll.register` which exposes SQL `hll_distinct(expr)`).
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  private val p = 11
  private val m = 1 << p

  // declares BIGINT input so the analyzer inserts implicit casts for
  // narrower integrals and REJECTS non-numeric args at analysis time —
  // without this, hll_distinct(string_col) would pass analysis and die
  // per-task with ClassCastException
  override def inputTypes = Seq(LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  /** splitmix64 finalizer — full-avalanche mix of the input long. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = mix(v.asInstanceOf[Long])
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rank = if (w == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m) // bias constant for m >= 128
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object hll {
  /** Registers SQL `hll_distinct(expr)` (expr must be castable to BIGINT). */
  def register(spark: SparkSession): Unit =
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct",
      exprs => {
        require(exprs.length == 1, s"hll_distinct expects 1 argument, got ${exprs.length}")
        HllSketch(exprs.head).toAggregateExpression()
      },
      "built-in")
}
