package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.7): the centroid of a group of float vectors —
  * the aggregation step of k-means / IVF cell refinement.
  *
  * Accumulation is EXACT: each float is quantized to 1e-6 and summed as a
  * Long. Long addition is associative, so the result is independent of
  * partition count and shuffle-merge order — double accumulation here would
  * be nondeterministic across runs (FP addition is not associative and
  * reduce-side merge order isn't fixed), which would break the engine's
  * determinism contract for any query built on it. Quantization error
  * (≤5e-7 per element) is far below any embedding-math tolerance; overflow
  * needs 9e12 vectors per cell at unit scale.
  */
final class VectorCentroid(dim: Int)
    extends Aggregator[Array[Float], VectorCentroid.Buf, Array[Float]] {
  import VectorCentroid._

  override def zero: Buf = Buf(new Array[Long](dim), 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += math.round(v(i).toDouble * Scale); i += 1 }
    Buf(b.sums, b.count + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    Buf(a.sums, a.count + b.count)
  }

  override def finish(b: Buf): Array[Float] =
    if (b.count == 0L) new Array[Float](dim)
    else b.sums.map(s => (s.toDouble / Scale / b.count).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}

object VectorCentroid {
  private val Scale = 1e6

  final case class Buf(sums: Array[Long], count: Long)
}
