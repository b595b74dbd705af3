package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN internals: scan-side assignment plan shape (the round-2 rewrite must
  * not reintroduce a pre-aggregation exchange) and the Lloyd refinement's
  * cell-balance + determinism contract. Balance is asserted on the real
  * sf0.001 table (read-only, seed-pinned by the driver) because MiniData's
  * six vectors can't express a 16-cell histogram.
  */
class AnnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cellSizes(cents: Seq[(Int, Array[Float])]): Seq[Long] = {
    val e = Tables.t(spark, sf, "embeddings")
    Ann.assignTo(spark, e, cents)
      .groupBy("cid").count().collect().map(_.getLong(1)).toSeq.sorted
  }

  private def seeds: Seq[(Int, Array[Float])] =
    Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < Ann.NumCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

  test("scan-side assignment: no Exchange in the assignment subplan") {
    val e = Tables.t(spark, sf, "embeddings")
    val plan = Ann.assignTo(spark, e, seeds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must be a pure projection:\n$plan")
  }

  test("one Lloyd iteration fills all cells and improves balance vs first-16 seeds") {
    def stddev(x: Seq[Long]): Double = {
      val m = x.sum.toDouble / x.size
      math.sqrt(x.map(v => (v - m) * (v - m)).sum / x.size)
    }
    val s0 = cellSizes(seeds)
    val s1 = cellSizes(Ann.kmeansCentroids(spark, sf))
    assert(s1.size === Ann.NumCentroids, "no cell may end up empty")
    assert(s1.min > 0)
    assert(stddev(s1) < stddev(s0),
      s"refined cells should be more balanced: seeds=$s0 refined=$s1")
  }

  test("refined centroids are bit-identical across recomputation") {
    val a = Ann.kmeansCentroids(spark, sf)
    val b = Ann.kmeansCentroids(spark, sf)
    assert(a.map(_._1) === b.map(_._1))
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.sameElements(y) })
  }
}
