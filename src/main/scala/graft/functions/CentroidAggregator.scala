package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` exemplar (SURVEY §2.7's UDAF surface, shipped round
  * 5): the per-group vector centroid over `ArrayType(FloatType)`
  * embeddings, accumulated in EXACT quantized integers so the result is
  * aggregation-order-free — the property a naive "sum doubles per lane"
  * UDAF silently lacks (FP addition is not associative; partial-merge
  * order varies run to run, and a centroid built that way can never be
  * hash-checked against an oracle).
  *
  * Sibling of [[VectorCentroid]] (the Lloyd-refinement centroid used
  * inside the IVF build): that one finishes to `Array[Float]` centroids
  * for in-engine consumption and quantizes with round-half-up; THIS one
  * exposes the RAW integer state (count + lane sums) and quantizes with
  * floor — the two choices that make the result replayable in a DuckDB
  * oracle (floor has one cross-engine convention; the state defers every
  * division to the display layer). Declared as `q_embed_centroid`.
  *
  * Quantization: lane value → ⌊x · 2^20⌋ as a Long. The double product is
  * EXACT (a float widens to double losslessly and 2^20 is a power of
  * two), floor is exact in both engines (unlike round, whose half-case
  * convention differs: JVM Math.round is half-up, DuckDB CAST is
  * half-even), and Long sums are associative — so the buffer, its merges,
  * and the finished state are bit-identical whatever Spark's partition
  * and combine order. Headroom: |x| ≤ ~10 ⇒ |lane sum| < 10·2^20·n —
  * overflows Long only past n ≈ 8·10^11 rows per group.
  *
  * Buffer layout: slot 0 = row count, slots 1..dims = quantized lane
  * sums. The buffer travels via the kryo encoder (opaque bytes — fine for
  * an internal state), the OUTPUT via a real ExpressionEncoder so the
  * result lands in columnar form.
  */
class CentroidAggregator(dims: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  private val Q = 1048576.0 // 2^20

  override def zero: Array[Long] = new Array[Long](dims + 1)

  override def reduce(b: Array[Long], a: Seq[Float]): Array[Long] = {
    require(a.length == dims, s"expected $dims-dim vector, got ${a.length}")
    b(0) += 1
    var i = 0
    while (i < dims) {
      b(i + 1) += math.floor(a(i).toDouble * Q).toLong
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= dims) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(reduction: Array[Long]): Seq[Long] =
    reduction.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
