package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.IndexLifecycle
import org.apache.spark.sql.functions._

/** Serve-only scale probe for the ANN write-then-serve lifecycle (round 9,
  * VERDICT item 3 done-criterion): the ×100 ScaleStress slopes attributed
  * the kNN/semantic super-linearity (16.7× / 13.0× at ×100) to PER-RUN
  * quantizer training crossing the tier switch — a cost the production
  * posture pays ONCE at write time. This tool separates the two: it runs
  * `IndexLifecycle.writeAnnIndex` once over a ScaleStress replica corpus
  * (timed — train + bucketed write), then times the SERVING paths
  * (kNN join, SemDeDup, 5-query ANN search) from the written artifacts
  * with zero retraining. Comparing serve_sec across ×10/×100 gives the
  * serve-only slope, which is candidate-volume bound (Σ|cell|² ≈
  * N·CellTarget — linear) by construction.
  *
  * Run: `sbt "runMain graft.tools.AnnServedStress [copies]"` after
  * `ScaleStress <copies>` has built `/tmp/graft_scale_x<copies>`.
  */
object AnnServedStress {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val dir = s"/tmp/graft_scale_x$copies"
    require(Files.exists(Paths.get(dir, "_GRAFT_SCALE_COMPLETE")),
      s"replica corpus missing — run `ScaleStress $copies` first ($dir)")
    val spark = Stress2.session()
    val prefix = s"stress_ann_x$copies"

    val tw0 = System.nanoTime()
    IndexLifecycle.writeAnnIndex(spark, dir, prefix, 16)
    val writeSec = (System.nanoTime() - tw0) / 1e9

    def timed(f: => Long): (Double, Long) = {
      val warmRows = f // JIT + codegen + parquet footer caches
      val t1 = System.nanoTime(); f
      val s1 = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); f
      val s2 = (System.nanoTime() - t2) / 1e9
      (math.min(s1, s2), warmRows)
    }
    val (knnSec, knnRows) =
      timed(IndexLifecycle.servedKnnJoin(spark, prefix).count())
    val (semSec, semRows) =
      timed(IndexLifecycle.servedSemanticDedup(spark, prefix).count())
    val (searchSec, searchRows) =
      timed(IndexLifecycle.servedAnnSearch(spark, prefix, 5, 4).count())
    val n = spark.table(s"${prefix}_ann_cells").count()
    val k = spark.table(s"${prefix}_ann_codebook")
      .filter(col("part").isin("flat", "sub")).count() max
      { val s = spark.table(s"${prefix}_ann_codebook")
          .groupBy(col("part")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        s.getOrElse("a", 0L) * s.getOrElse("b", 0L) }
    println(f"""{"probe":"ann_served","copies":$copies,"vectors":$n,""" +
      f""""cells":$k,"write_sec":$writeSec%.2f,""" +
      f""""knn_sec":$knnSec%.2f,"knn_rows":$knnRows,""" +
      f""""sem_sec":$semSec%.2f,"sem_rows":$semRows,""" +
      f""""search_sec":$searchSec%.2f,"search_rows":$searchRows}""")
    spark.stop()
  }
}
