package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler for q_llm_pipeline: materializes each staged
  * hand-off in funnel order and prints the INCREMENTAL wall time, so a
  * composition-overhead regression (the whole ledger costing multiples of
  * its component queries) can be attributed to a stage instead of guessed
  * at. Usage: runMain graft.tools.ProfileLlm [sfDir]
  */
object ProfileLlm {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tick(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[llm] $label%-12s rows=$n%-8d +${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    for (rep <- 1 to 2) {
      println(s"[llm] pass $rep")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      val st = graft.operators.LlmPipeline.stages(spark, sfDir)
      tick("base")(st.base.count())
      tick("s1")(st.s1.count())
      tick("s2")(st.s2.count())
      tick("s3")(st.s3.count())
      tick("s4")(st.s4.count())
      tick("s5")(st.s5.count())
      tick("splits")(st.splitRows.count())
      tick("splits2")(st.splitRows.count())
      tick("s5-again")(st.s5.count())
      tick("ledger") {
        graft.Registry.byName("q_llm_pipeline").run(spark, sfDir).count()
      }
      tick("ledger2") {
        graft.Registry.byName("q_llm_pipeline").run(spark, sfDir).count()
      }

      // round 8 (VERDICT item 6): the incremental query's stage anatomy —
      // the index-state build (idxS2), the batch delta (d2), then the
      // remaining band/verify/decontam work attributed as (ledger − parts)
      println(s"[llm] incremental, pass $rep")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.t(spark, sfDir, "documents")
      val ex = graft.operators.LlmPipeline.incrementalExact(
        spark, docs.filter(col("doc_id") >= 4),
        pmod(col("doc_id"), lit(10L)) === 0L)
      tick("idxS2")(ex.idxS2.count())
      tick("d2")(ex.d2.count())
      tick("inc-rest") {
        graft.operators.LlmPipeline.incrementalLedger(
          spark, docs.filter(col("doc_id") >= 4),
          pmod(col("doc_id"), lit(10L)) === 0L,
          docs.filter(col("doc_id") < 4)).count()
      }
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      tick("inc-full") {
        graft.Registry.byName("q_llm_pipeline_incremental").run(spark, sfDir).count()
      }
      tick("inc-full2") {
        graft.Registry.byName("q_llm_pipeline_incremental").run(spark, sfDir).count()
      }

      // round 9 (VERDICT item 4): the reconciled-mix query's stage anatomy
      // — the shared incremental exact state (idxS2 + d2), the persisted
      // reconciled corpus c2, then each successor hand-off (near-dup m3,
      // decontam m4, mix m5, split) ticked INCREMENTALLY in funnel order;
      // mix-full re-runs the whole declared query for the composition
      // overhead read (full − Σ parts).
      println(s"[llm] mix, pass $rep")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      val rs = graft.operators.LlmPipeline.reconciledStages(
        spark, docs.filter(col("doc_id") >= 4),
        pmod(col("doc_id"), lit(10L)) === 0L,
        docs.filter(col("doc_id") < 4))
      tick("mix-c2")(rs.c2.count())
      tick("mix-m3")(rs.suc.s3.count())
      tick("mix-m4")(rs.suc.s4.count())
      tick("mix-m5")(rs.suc.s5.count())
      tick("mix-split")(rs.suc.splitRows.count())
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      tick("mix-full") {
        graft.Registry.byName("q_llm_pipeline_mix").run(spark, sfDir).count()
      }
      tick("mix-full2") {
        graft.Registry.byName("q_llm_pipeline_mix").run(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
