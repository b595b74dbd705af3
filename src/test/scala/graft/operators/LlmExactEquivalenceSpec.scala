package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 10 (VERDICT item 2): [[LlmPipeline.incrementalExact]]'s
  * exact-dedup state is now ONE (h, text) grouping with an old-side-first
  * argmin survivor instead of two digest groupings plus an (h, text)
  * anti-join — one corpus exchange per replayed lineage instead of three.
  * This spec pins the equivalence against the literal two-sided
  * construction (the pre-round-10 shape) on the DECLARED pmod split — a
  * non-ordered split, so a duplicate group can hold old and new members
  * in any id order and the survivor pick is genuinely exercised.
  */
class LlmExactEquivalenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("incrementalExact single-pass form = the two-sided group/anti-join construction") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") >= 4)
    val isNew = pmod(col("doc_id"), lit(10L)) === 0L
    val ex = LlmPipeline.incrementalExact(spark, docs, isNew)
    def keyed(df: DataFrame) =
      df.select("doc_id", "lang", "text", "n_tok", "fp")
        .collect().map(_.toSeq).toSet
    // the literal two-sided construction (the pre-round-10 shape)
    def measured2(df: DataFrame) = df
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("fp", graft.XHash.h60(
        concat(col("doc_id").cast("string"), lit(":"), col("text"))))
    def gate(df: DataFrame) =
      measured2(df).withColumn("q", TextOps.qualityGate).filter(col("q"))
        .select(col("doc_id"), col("lang"), col("text"))
    def grouped(df: DataFrame) =
      Dedup.digestClustered(gate(df))
        .groupBy(col("h"), col("text"))
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"))
    val i2ref = measured2(grouped(docs.filter(!isNew))
      .select(col("doc_id"), col("lang"), col("text")))
    val d2ref = measured2(grouped(docs.filter(isNew))
      .join(grouped(docs.filter(!isNew)).select(col("h"), col("text")),
        Seq("h", "text"), "left_anti")
      .select(col("doc_id"), col("lang"), col("text")))
    assert(keyed(ex.idxS2) === keyed(i2ref), "idxS2 drifted from the two-sided form")
    assert(keyed(ex.d2) === keyed(d2ref), "d2 drifted from the two-sided form")
    assert(keyed(ex.c2) === (keyed(i2ref) ++ keyed(d2ref)),
      "c2 is not the disjoint union of the two sides")
    assert(keyed(ex.d2).nonEmpty && keyed(ex.idxS2).nonEmpty, "degenerate split")
    graft.Caches.release(spark)
  }
}
