package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder: per row, the argmin codeword id in
  * each of `numSubspaces` subspaces against a driver-side codebook.
  *
  * WHY AN EXPRESSION (round 4): the same argmin written as a Column tree —
  * M=16 × Ks=64 `array_min(struct(d², k))` over 4-term squared-distance
  * expressions — is ~25k Catalyst nodes; analysis + optimization + codegen
  * of that tree cost ~55 s PER RUN at any data size (measured at sf0.001
  * AND sf0.1 — pure plan overhead, not data). This expression is ONE node
  * holding the codebook as a reference object and loops over it in
  * codegen, exactly like a hand-written encoder: sub-second planning, and
  * the per-row work is the same 1024 fused multiply-adds.
  *
  * DETERMINISM CONTRACT (shared with the q_sim_ann_pq oracle): each
  * subspace d² accumulates (emb[i]−cw[i])² left-to-right in element order
  * over float→double widenings (exact), is quantized
  * `floor(d² · quantScale)` to a long BEFORE comparison, and ties break
  * toward the SMALLEST codeword id (strict `<` keeps the first minimum).
  * The interpreted and generated paths run the identical op sequence, and
  * the DuckDB replay spells out the same left-associative term tree.
  *
  * Codebook width must equal the input vector length; mismatched input
  * yields NULL (the [[CosineSimilarity]] length contract).
  */
case class PqEncode(
    child: Expression,
    codebook: Vector[Vector[Float]],
    numSubspaces: Int,
    quantScale: Double)
    extends UnaryExpression with ExpectsInputTypes {

  private val ks = codebook.size
  private val dim = codebook.head.size
  private val subDim = dim / numSubspaces

  /** k-major flattened double codebook shared by both eval paths. */
  @transient private lazy val flat: Array[Double] =
    codebook.flatten.map(_.toDouble).toArray

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val codes = new Array[Int](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      var best = Long.MaxValue
      var bestK = 0
      var k = 0
      while (k < ks) {
        var acc = 0.0
        var i = m * subDim
        while (i < (m + 1) * subDim) {
          val diff = x.getFloat(i).toDouble - flat(k * dim + i)
          acc += diff * diff
          i += 1
        }
        val q = math.floor(acc * quantScale).toLong
        if (q < best) { best = q; bestK = k }
        k += 1
      }
      codes(m) = bestK
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val q = ctx.freshName("q")
      val best = ctx.freshName("best")
      val bestK = ctx.freshName("bestK")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $codes = new int[$numSubspaces];
         |  for (int $m = 0; $m < $numSubspaces; $m++) {
         |    long $best = Long.MAX_VALUE; int $bestK = 0;
         |    for (int $k = 0; $k < $ks; $k++) {
         |      double $acc = 0.0;
         |      for (int $i = $m * $subDim; $i < ($m + 1) * $subDim; $i++) {
         |        final double $diff = ((double) $a.getFloat($i)) - $cb[$k * $dim + $i];
         |        $acc += $diff * $diff;
         |      }
         |      final long $q = (long) java.lang.Math.floor($acc * ${quantScale}D);
         |      if ($q < $best) { $best = $q; $bestK = $k; }
         |    }
         |    $codes[$m] = $bestK;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) scorer over PQ codes, multi-query form
  * (round 7, VERDICT item 7): `Σ_m lut[q·M·Ks + m·Ks + code_m]`, an exact
  * integer sum of the per-subspace quantized distances each query
  * precomputed against every codeword — ONE registered function for ANY
  * number of queries, replacing the round-4 shape that registered
  * `pq_adc_$qi` per query (a linear session-registry leak) and carried
  * each query's LUT as a separate plan reference. The stacked lookup
  * table — query-major slabs, then subspace-major — travels as ONE
  * BROADCAST (the [[TopCells]] round-6 contract), the queries travel as a
  * broadcast RELATION carrying their slab index, and scoring is
  * `pq_adc_multi(codes, qidx)`. Null in → null out (either argument); a
  * code outside [0, Ks) cannot occur by construction ([[PqEncode]] emits
  * argmin ids). */
case class PqAdcMulti(
    left: Expression,
    right: Expression,
    lut: org.apache.spark.broadcast.Broadcast[Array[Long]],
    numSubspaces: Int,
    ks: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  @transient private lazy val flat: Array[Long] = lut.value

  override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_multi"

  // round 8 (ADVICE): a qidx outside the stacked LUT's slab range — a
  // mis-built query relation or a stale registered factory paired with a
  // wider qidx column — must fail with the CONTRACT named, not as a raw
  // ArrayIndexOutOfBoundsException from inside generated code (or a silent
  // wrong-slab read if negative arithmetic ever fed the index).
  private def slabError(qidx: Int, slabs: Int): String =
    s"pq_adc_multi: query index $qidx outside stacked LUT " +
      s"($slabs slabs of ${numSubspaces * ks} entries)"

  override def nullSafeEval(codesAny: Any, qidxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val qidx = qidxAny.asInstanceOf[Int]
    val slab = numSubspaces * ks
    if (qidx < 0 || (qidx.toLong + 1) * slab > flat.length)
      throw new IllegalArgumentException(slabError(qidx, flat.length / slab))
    val base = qidx * slab
    var total = 0L
    var m = 0
    while (m < numSubspaces) {
      total += flat(base + m * ks + codes.getInt(m))
      m += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = "org.apache.spark.broadcast.Broadcast"
    val lutRef = ctx.addReferenceObj("pqLutBc", lut, bcCls)
    val lutArr = ctx.addMutableState("long[]", "pqLutAll",
      v => s"$v = (long[]) (($bcCls) $lutRef).value();")
    nullSafeCodeGen(ctx, ev, (codes, qidx) => {
      val m = ctx.freshName("m")
      val base = ctx.freshName("base")
      val total = ctx.freshName("total")
      val slab = numSubspaces * ks
      s"""
         |if ($qidx < 0 || ((long) $qidx + 1L) * ${slab}L > $lutArr.length) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_multi: query index " + $qidx + " outside stacked LUT (" +
         |    ($lutArr.length / $slab) + " slabs of $slab entries)");
         |}
         |final int $base = $qidx * $slab;
         |long $total = 0L;
         |for (int $m = 0; $m < $numSubspaces; $m++) {
         |  $total += $lutArr[$base + $m * $ks + $codes.getInt($m)];
         |}
         |${ev.value} = $total;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcMulti =
    copy(left = newLeft, right = newRight)
}

object PqAdcMulti {
  /** Broadcast the stacked LUT once and return the two-arg factory.
    * `nQueries` pins the slab count the builder intends — a LUT whose
    * length disagrees with nQueries·M·Ks slabs is a construction bug and
    * fails HERE, at broadcast time, not as an index error mid-scan
    * (round 8, ADVICE). */
  def broadcastOf(
      spark: org.apache.spark.sql.SparkSession,
      lut: Vector[Long],
      numSubspaces: Int,
      ks: Int,
      nQueries: Int): (Expression, Expression) => PqAdcMulti = {
    require(lut.size == nQueries.toLong * numSubspaces * ks,
      s"stacked LUT must hold nQueries*M*Ks = $nQueries*$numSubspaces*$ks " +
        s"= ${nQueries.toLong * numSubspaces * ks} entries, got ${lut.size}")
    val bc = spark.sparkContext.broadcast(lut.toArray)
    (codes, qidx) => PqAdcMulti(codes, qidx, bc, numSubspaces, ks)
  }
}

/** Registry front door for the PQ expressions: the codebook/lookup-table is
  * plan-build data (collected seeds / trained codewords), so the Column API
  * can't take it as a SQL argument — instead each plan registers a temp
  * function whose BUILDER captures the instance, then reaches it via
  * `call_function` (the [[vec.register]] pattern; createOrReplace semantics,
  * and Verify/Bench drive one query at a time on a session, so the last
  * registration is always the live plan's). */
object pq {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  private val uniq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Bound on live `_uN` registrations (round 9, ADVICE): names cycle
    * through a ring of this many slots instead of growing forever, so a
    * long-lived serving session that builds thousands of assign/probe
    * plans holds a BOUNDED FunctionRegistry. Uniqueness only has to cover
    * the window between a plan's registration and its eager analysis
    * (microseconds on the building thread) — a collision needs RingSize
    * interleaved registrations inside that window. */
  private val RingSize = 1024L

  /** Register under a per-call UNIQUE name (`base_uN`, N cycling through a
    * bounded ring) and return it — for plan-build-time registrations on a
    * SHARED session (round 8, ADVICE): two plans built concurrently with a
    * fixed name could resolve each other's factory between register and
    * eager analysis; a unique name makes the registration private to the
    * plan being built. Plan pins are unaffected — plans print the resolved
    * expression's prettyName, not the registry key. */
  def registerUnique(
      spark: SparkSession,
      base: String,
      builder: Seq[Expression] => Expression): String = {
    val name = s"${base}_u${uniq.incrementAndGet() % RingSize}"
    register(spark, name, builder)
    name
  }
}
