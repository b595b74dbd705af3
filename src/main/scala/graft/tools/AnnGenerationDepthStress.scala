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
  * Split shape: main = the id-PREFIX half of the corpus (quantizerOn's
  * append-only seed invariant — a modular split like the dedup probe's
  * would trip assertPrefixSeeds), deltas = 8 contiguous id slices of the
  * upper half, exactly an append-only ingest's batches. Queries are
  * `vec_id < 10`, all in main, so [[IndexLifecycle.servedAnnSearchFrom]]
  * serves the IDENTICAL query rows at every depth — the real serving
  * path, fixed query volume.
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
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val half = maxId / 2
    val slice = (maxId - half) / 8

    // main = id-prefix half; 8 contiguous append slices as deltas,
    // assigned through main's FROZEN codebook (zero retraining)
    val tw0 = System.nanoTime()
    IndexLifecycle.writeAnnIndexFor(
      spark, emb.filter(col("vec_id") < half), s"agd_main_$copies", 16)
    val writeSec = (System.nanoTime() - tw0) / 1e9
    val tu0 = System.nanoTime()
    (0 until 8).foreach { i =>
      val lo = half + i * slice
      val hi = if (i == 7) maxId else half + (i + 1) * slice
      IndexLifecycle.upsertAnnCells(spark,
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi),
        s"agd_main_$copies", s"agd_d${i}_$copies", 16)
    }
    val upsertSec = (System.nanoTime() - tu0) / 1e9
    println(f"""{"probe":"ann_gen_setup","copies":$copies,""" +
      f""""write_sec":$writeSec%.2f,"upsert8_sec":$upsertSec%.2f}""")

    /** Min-of-2 warm serve over the given live generations through the
      * REAL serving path; queries (vec_id < 10) live in main at every
      * depth, so the query rows are identical across configurations. */
    def serveOver(mainPrefix: String, prefixes: Seq[String]): Double = {
      def once(): Long = IndexLifecycle
        .servedAnnSearchFrom(spark, mainPrefix, prefixes, 10, 4).count()
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
