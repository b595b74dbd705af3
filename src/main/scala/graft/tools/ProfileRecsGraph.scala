package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q_recs_itemcf and q_graph_kcore (round 12,
  * VERDICT item 1 — the two never-profiled members of the ≥4.4 s graded
  * band). Materializes each staged hand-off in order and prints the
  * INCREMENTAL wall time, so the cost can be attributed to a stage:
  *
  *   itemcf: the deduped (order, part) incidence build (repartition +
  *     partition-local dropDuplicates + cache write), the basket
  *     self-join + pair agg, the scored relation, the top-3 window, the
  *     full query, and a warm re-run.
  *   kcore: the persisted weighted-bigram edge relation (corpus shingle
  *     scan + pair agg), the adaptive-k driver fetch (it runs at state
  *     construction), each surviving peel composite, the full query.
  *
  * Usage: runMain graft.tools.ProfileRecsGraph [sfDir] [reps]
  */
object ProfileRecsGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
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
      println(f"[rg] $label%-14s rows=$n%-9d +${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    for (rep <- 1 to reps) {
      println(s"[rg] itemcf pass $rep")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      val cf = graft.operators.Recs.itemCf(spark, sfDir)
      tick("li")(cf.li.count())
      tick("pairs")(cf.pairs.count())
      tick("scored")(cf.scored.count())
      tick("top3")(cf.top.count())
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      val fullDf = graft.Registry.byName("q_recs_itemcf").run(spark, sfDir)
      tick("full")(fullDf.collect().length.toLong)
      // runtime reuse evidence: the static plan carries one lineitem scan
      // site per consumer lineage; AQE must collapse the identical
      // exchanges into ReusedExchange/stage reuse at execution. collect()
      // above executed THIS QueryExecution, so the adaptive plan is final.
      val ep = fullDf.queryExecution.executedPlan.toString
      def cnt(pat: String) = pat.r.findAllIn(ep).size
      println(s"[rg] executed final=${ep.contains("isFinalPlan=true")} " +
        s"scans=${cnt("Scan parquet|FileScan parquet")} " +
        s"reused=${cnt("ReusedExchange|reuses_operator_id")} " +
        s"exchanges=${cnt("Exchange (hash|Round|range)")}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/recs_executed_$rep.txt"), ep)
      tick("full-warm")(graft.Registry.byName("q_recs_itemcf").run(spark, sfDir).count())

      println(s"[rg] kcore pass $rep")
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      var t0 = System.nanoTime()
      val st = graft.operators.GraphOps.kcoreState(spark, sfDir)
      println(f"[rg] state-k=${st.k}%-8d +${(System.nanoTime() - t0) / 1e9}%.2fs (pj cache + 1-row fetch)")
      tick("pj")(st.pj.count())
      tick("sym")(st.sym.count())
      for (r <- Seq(2, 4, 8)) {
        t0 = System.nanoTime()
        val n = graft.operators.GraphOps.kcoreSurvivors(st.sym, st.k, rounds = r).count()
        println(f"[rg] peel-$r%-9s rows=$n%-9d +${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      tick("full")(graft.Registry.byName("q_graph_kcore").run(spark, sfDir).count())
      tick("full-warm")(graft.Registry.byName("q_graph_kcore").run(spark, sfDir).count())
    }
    spark.stop()
  }
}
