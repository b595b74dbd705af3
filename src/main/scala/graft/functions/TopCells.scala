package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native top-N-cells selector for the IVF family: per row, the ids of the
  * `topN` centroids with the highest quantized cosine against the input
  * vector, ordered (quantized cosine DESC, cid ASC).
  *
  * WHY (round 4): the Column-tree form — `array_max`/`sort_array` over k
  * `struct(quant(cosine_sim(emb, lit(centroid))), flippedCid)` entries —
  * is ~70 Catalyst nodes per centroid. Fine at k=16; at the data-dependent
  * k the cell-blocked queries need for bounded cells (k = N/125 — without
  * it within-cell pair volume is N²/k, measured 204 s for the ×10 k-NN
  * join), k in the hundreds would hit the wide-tree planning trap
  * [[PqEncode]] documents. One expression node holds the centroid matrix
  * and loops.
  *
  * HOW THE MATRIX TRAVELS (round 6): as a BROADCAST variable, not a
  * serialized expression constant. The round-4 form embedded the flattened
  * matrix in the case class, so every task binary carried k·dim doubles
  * and the plan size grew linearly with k = N/125 — the one unbounded
  * driver-artifact path in the engine. Now the expression holds only the
  * Broadcast handle (O(1) plan size at any k); executors fetch the matrix
  * once per JVM over the torrent protocol, and codegen dereferences
  * `.value()` ONCE per operator instance into a mutable-state `double[]`
  * (never per row). Build via [[TopCells.broadcastOf]]. The driver still
  * materializes the k-row codebook to create the broadcast — that is the
  * codebook itself (k·dim·8 B ≈ 4 GB at k = 8M·64d, the standard
  * host-trained coarse-quantizer shape); past
  * [[graft.operators.Ann.FlatMaxCells]] cells the two-level IMI quantizer
  * ([[TwoLevelCells]], round 7 — √k top cells, per-cell sub-codebooks)
  * replaces this flat scan, same expression contract per level.
  *
  * MATH CONTRACT (bit-compatible with the [[CosineSimilarity]] +
  * `array_max`-over-structs path it replaces, which the DuckDB oracles
  * replay): per centroid, dot/normX/normY accumulate left-to-right in
  * element order over float→double widenings; cosine = dot /
  * (sqrt(nx)·sqrt(ny)), 0.0 on zero norm; quantize `floor(cos·quantScale)`
  * to a long BEFORE comparison; rank (quant DESC, cid ASC) — iterating
  * cids ascending with a strict `>` insertion keeps the smaller cid ahead
  * on equal quantized values, exactly the flipped-cid struct tie-break.
  * normX depends only on the input row, so it is hoisted out of the
  * centroid loop — same additions, same result, k× fewer of them.
  * Interpreted and generated paths run the identical op sequence.
  *
  * Mismatched input length yields NULL (the [[CosineSimilarity]] length
  * contract); fewer centroids than topN yields the full ranking.
  */
case class TopCells(
    child: Expression,
    centroids: Broadcast[Array[Double]],
    k: Int,
    dim: Int,
    topN: Int,
    quantScale: Double)
    extends UnaryExpression with ExpectsInputTypes {

  private val n = math.min(topN, k)

  /** cid-major flattened double centroid matrix (interpreted path; the
    * codegen path dereferences the broadcast in its own init). */
  @transient private lazy val flat: Array[Double] = centroids.value

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "top_cells"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val cm = flat
    var nx = 0.0
    var i = 0
    while (i < dim) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
    val bestQ = Array.fill(n)(Long.MinValue)
    val bestC = new Array[Int](n)
    var cid = 0
    while (cid < k) {
      var dot = 0.0; var ny = 0.0
      var j = 0
      while (j < dim) {
        val xv = x.getFloat(j).toDouble
        val yv = cm(cid * dim + j)
        dot += xv * yv; ny += yv * yv
        j += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      val cos = if (den == 0.0) 0.0 else dot / den
      val q = math.floor(cos * quantScale).toLong
      // strict > keeps the earlier (smaller) cid on equal quantized cosine
      var p = n
      while (p > 0 && q > bestQ(p - 1)) p -= 1
      if (p < n) {
        var s = n - 1
        while (s > p) { bestQ(s) = bestQ(s - 1); bestC(s) = bestC(s - 1); s -= 1 }
        bestQ(p) = q; bestC(p) = cid
      }
      cid += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle is the only plan reference; the matrix itself is
    // fetched once per generated-class instance into mutable state
    val bcCls = "org.apache.spark.broadcast.Broadcast"
    val bcRef = ctx.addReferenceObj("cellCentroidsBc", centroids, bcCls)
    val cm = ctx.addMutableState("double[]", "cellCm",
      v => s"$v = (double[]) (($bcCls) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, a => {
      val nx = ctx.freshName("nx")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cid = ctx.freshName("cid")
      val dot = ctx.freshName("dot")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val den = ctx.freshName("den")
      val cos = ctx.freshName("cos")
      val q = ctx.freshName("q")
      val bestQ = ctx.freshName("bestQ")
      val bestC = ctx.freshName("bestC")
      val p = ctx.freshName("p")
      val sh = ctx.freshName("sh")
      val v = ctx.freshName("v")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nx = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    final double $v = (double) $a.getFloat($i); $nx += $v * $v;
         |  }
         |  final long[] $bestQ = new long[$n];
         |  final int[] $bestC = new int[$n];
         |  java.util.Arrays.fill($bestQ, Long.MIN_VALUE);
         |  for (int $cid = 0; $cid < $k; $cid++) {
         |    double $dot = 0.0; double $ny = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      final double $xv = (double) $a.getFloat($j);
         |      final double $yv = $cm[$cid * $dim + $j];
         |      $dot += $xv * $yv; $ny += $yv * $yv;
         |    }
         |    final double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    final double $cos = ($den == 0.0) ? 0.0 : $dot / $den;
         |    final long $q = (long) java.lang.Math.floor($cos * ${quantScale}D);
         |    int $p = $n;
         |    while ($p > 0 && $q > $bestQ[$p - 1]) $p--;
         |    if ($p < $n) {
         |      for (int $sh = $n - 1; $sh > $p; $sh--) {
         |        $bestQ[$sh] = $bestQ[$sh - 1]; $bestC[$sh] = $bestC[$sh - 1];
         |      }
         |      $bestQ[$p] = $q; $bestC[$p] = $cid;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

object TopCells {
  /** Broadcast the centroid matrix ONCE and return the expression factory —
    * the only sanctioned way to build [[TopCells]]: every consumer of one
    * codebook shares one broadcast, and the plan carries a handle, not the
    * matrix. */
  def broadcastOf(
      spark: SparkSession,
      cents: Vector[Vector[Float]],
      topN: Int,
      quantScale: Double): Expression => TopCells = {
    val bc = matrixBroadcast(spark, cents)
    child => TopCells(child, bc, cents.size, cents.head.size, topN, quantScale)
  }

  /** Broadcast a centroid matrix alone (round 8, ADVICE): a quantizer that
    * serves several assign/probe plans broadcasts its matrix ONCE through
    * this and builds each [[TopCells]] with differing topN over the shared
    * handle, instead of re-broadcasting per plan via [[broadcastOf]]. */
  def matrixBroadcast(
      spark: SparkSession,
      cents: Vector[Vector[Float]]): Broadcast[Array[Double]] =
    spark.sparkContext.broadcast(cents.flatten.map(_.toDouble).toArray)
}
