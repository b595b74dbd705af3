package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.IndexLifecycle
import org.apache.spark.sql.functions._

/** ANN generation-DEPTH probe (round 11, VERDICT item 3 — the ANN analog
  * of GenerationDepthStress): serving an upserted ANN index pays one
  * bucketed cells scan per live delta generation; this measures the
  * degradation curve at 1/2/4/8 live deltas over a ScaleStress replica
  * corpus, then the COMPACTION payoff — [[IndexLifecycle.compactAnnIndex]]
  * is a retrain-and-rebuild (the one point the frozen cell geometry moves),
  * unlike the dedup family's pure fold — and the post-compaction
  * single-generation serve.
  *
  * The query set is FIXED across depths (10 vectors drawn from the MAIN
  * generation's id range, present at every depth): `servedAnnSearchFrom`'s
  * own `vec_id < n` query rule would draw a different query count per
  * depth here because the deltas own the low ids, conflating query volume
  * with generation count. The serve math is otherwise identical — the
  * rebuilt quantizer probes, candidates come from the bucketed cells
  * union, scored by the shared [[graft.operators.Ann.annSearchFrom]].
  *
  * Usage: runMain graft.tools.AnnGenerationDepthStress [copies]
  * (after `ScaleStress <copies>` has built /tmp/graft_scale_x<copies>)
  */
object AnnGenerationDepthStress {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 8
    val dir = s"/tmp/graft_scale_x$copies"
    require(Files.exists(Paths.get(dir, "_GRAFT_SCALE_COMPLETE")),
      s"replica corpus missing — run `ScaleStress $copies` first ($dir)")
    val spark = Stress2.session()
    val emb = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val m16 = pmod(col("vec_id"), lit(16L))

    // main = half the corpus (m16 in 8..15), 8 equal deltas (m16 = 0..7) —
    // the deltas assign through main's FROZEN codebook (zero retraining)
    val tw0 = System.nanoTime()
    IndexLifecycle.writeAnnIndexFor(
      spark, emb.filter(m16 >= 8L), s"agd_main_$copies", 16)
    val writeSec = (System.nanoTime() - tw0) / 1e9
    val tu0 = System.nanoTime()
    (0 until 8).foreach { i =>
      IndexLifecycle.upsertAnnCells(spark, emb.filter(m16 === i.toLong),
        s"agd_main_$copies", s"agd_d${i}_$copies", 16)
    }
    val upsertSec = (System.nanoTime() - tu0) / 1e9
    println(f"""{"probe":"ann_gen_setup","copies":$copies,""" +
      f""""write_sec":$writeSec%.2f,"upsert8_sec":$upsertSec%.2f}""")

    /** Min-of-2 warm serve over the given live generations; queries are
      * the 10 lowest main-range ids — identical rows at every depth. */
    def serveOver(mainPrefix: String, prefixes: Seq[String]): Double = {
      val cells = prefixes.map(p => spark.table(s"${p}_ann_cells"))
        .reduce(_.unionByName(_))
      val qz = IndexLifecycle.readAnnQuantizer(spark, mainPrefix)
      val queries = spark.table(s"agd_main_${copies}_ann_cells")
        .filter(col("vec_id") < 16L * 10)
        .select(col("vec_id"), col("embedding"))
      def once(): Long = {
        val q = qz.probe(spark, queries, 4)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
            col("cid"))
        val cand = cells.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ne"), col("cid"))
        graft.operators.Ann.annSearchFrom(spark, q, cand).count()
      }
      once() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      graft.Caches.release(spark)
      ts.min
    }

    for (g <- Seq(1, 2, 4, 8)) {
      val gens = s"agd_main_$copies" +: (0 until g).map(i => s"agd_d${i}_$copies")
      val s = serveOver(s"agd_main_$copies", gens)
      println(f"""{"probe":"ann_gen_depth","copies":$copies,""" +
        f""""generations":${g + 1},"serve_sec":$s%.2f}""")
    }

    val allGens = s"agd_main_$copies" +: (0 until 8).map(i => s"agd_d${i}_$copies")
    val tc0 = System.nanoTime()
    IndexLifecycle.compactAnnIndex(spark, allGens, s"agd_comp_$copies", 16)
    val compactSec = (System.nanoTime() - tc0) / 1e9
    val sComp = serveOver(s"agd_comp_$copies", Seq(s"agd_comp_$copies"))
    println(f"""{"probe":"ann_gen_compact","copies":$copies,""" +
      f""""compact_sec":$compactSec%.2f,"serve_post_sec":$sComp%.2f}""")
    spark.stop()
  }
}
