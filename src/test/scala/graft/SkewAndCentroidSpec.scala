package graft

import graft.functions.VectorCentroid
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted ops must be transparent (same results as the unsalted plan) and
  * the centroid UDAF must be exact and partitioning-independent.
  */
class SkewAndCentroidSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key — the shape salting exists for
  private val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k${i % 7}", i.toLong))).toDF("k", "v")

  test("saltedCountSum equals the unsalted aggregation") {
    val salted = Skew.saltedCountSum(skewed, col("k"), col("v"), col("v"))
      .orderBy("k").collect().map(_.toSeq)
    val plain = skewed.groupBy(col("k").as("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .orderBy("k").collect().map(_.toSeq)
    assert(salted === plain)
  }

  test("saltedJoin equals the plain join") {
    val dims = (0 to 6).map(i => (s"k$i", s"name$i")).toDF("k", "name")
      .union(Seq(("hot", "hotname")).toDF("k", "name"))
    val salted = Skew.saltedJoin(skewed, dims, "k", col("v"))
      .orderBy("k", "v").collect().map(_.toSeq)
    val plain = skewed.join(dims, "k")
      .orderBy("k", "v").collect().map(_.toSeq)
    assert(salted === plain)
    assert(salted.length === 1000)
  }

  test("VectorCentroid: exact mean, stable across partitionings, empty-safe") {
    val centroidOf = udaf(new VectorCentroid(3))
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(3.0f, 2.0f, 1.0f)),
      (1L, Array(2.0f, 2.0f, 2.0f)),
      (2L, Array(-1.5f, 0.5f, 0.25f))).toDF("g", "vec")

    def run(parts: Int): Map[Long, Seq[Float]] =
      vecs.repartition(parts)
        .groupBy("g").agg(centroidOf(col("vec")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val r1 = run(1)
    assert(r1(1L) === Seq(2.0f, 2.0f, 2.0f))
    assert(r1(2L) === Seq(-1.5f, 0.5f, 0.25f))
    assert(run(7) === r1, "centroid must not depend on partitioning")
  }
}
