package graft.tools

import java.nio.file.{Files, Paths}

import graft.Registry
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up stress: replicate the sf0.1 tables 10× (keys re-offset so they
  * stay distinct) into /tmp and time the queries whose cost curves could
  * bend — dedup pair generation, winnowing, ANN, the multiway join. This is
  * a perf probe only (inputs are synthetic replicas, not driver data — the
  * DuckDB gate still runs on the real sfDirs).
  *
  * Usage: runMain graft.tools.ScaleStress [copies]
  */
object ScaleStress {
  private val Scaled =
    Seq("documents", "embeddings", "lineitem", "orders", "customer", "events")
  private val Passthrough = Seq("region", "nation", "supplier", "part")

  private val Stressed = Seq(
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_minhash_pairs",
    "q_dedup_jaccard_words", "q_dedup_jaccard_ngram", "q_dedup_simhash",
    "q_text_winnow", "q_dedup_winnow_pairs", "q_dedup_lsh_verify",
    "q_sim_cosine", "q_sim_ann_ivf",
    "q_sim_ann_lsh", "q_sim_ann_centroids", "q_agg_hash", "q_join_multiway",
    "q_window_rank", "q_topk_per_group", "q_sessionize", "q_join_interval",
    "q_text_rarity", "q_text_ngram_topk", "q_contamination",
    "q_sample_stratified", "q_text_pii_scrub")

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_scale_x$copies"
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.parquet carries TIMESTAMP(NANOS) — same shim Tables.events uses
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // completion marker, not bare directory existence: a crashed build must
    // not be mistaken for a finished one on rerun
    val marker = Paths.get(dst, "_GRAFT_SCALE_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val keyOf = Map(
        "documents" -> "doc_id", "embeddings" -> "vec_id",
        "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
        "customer" -> "c_custkey", "events" -> "event_id")
      for (t <- Scaled) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val key = keyOf(t)
        // derived from the data, not a constant: a fixed offset silently
        // collides keys (deflating dedup/join stress) once a base key
        // reaches it at larger source SFs (round-2 ADVICE)
        val offset = base.agg(max(col(key))).head.getLong(0) + 1
        val copiesDF = (0 until copies).map { i =>
          base.withColumn(key, col(key) + lit(i * offset))
        }.reduce(_ unionByName _)
        // orders/lineitem share o_orderkey=l_orderkey; customer keys feed
        // o_custkey — offset those foreign keys identically
        val fixed = t match {
          case "orders" =>
            (0 until copies).map { i =>
              base.withColumn("o_orderkey", col("o_orderkey") + lit(i * offset))
                .withColumn("o_custkey", col("o_custkey") + lit(i * offset))
            }.reduce(_ unionByName _)
          // distinct users per copy so per-user session/window state scales
          // with the data instead of deepening one user's history
          case "events" =>
            (0 until copies).map { i =>
              base.withColumn("event_id", col("event_id") + lit(i * offset))
                .withColumn("user_id", col("user_id") + lit(i * offset))
            }.reduce(_ unionByName _)
          case _ => copiesDF
        }
        fixed.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
        println(s"[scale] built $t x$copies")
      }
      for (t <- Passthrough) {
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      }
      Files.createFile(marker)
    }

    // warmup
    Stressed.foreach(n => try Registry.byName(n).run(spark, dst).count()
      catch { case e: Throwable => println(s"[scale] $n FAILED: ${e.getMessage}") })
    val timings = Stressed.flatMap { n =>
      val t0 = System.nanoTime()
      try {
        val rows = Registry.byName(n).run(spark, dst).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $n%-24s rows=$rows%-8d ${sec}%.2fs")
        Some(n -> sec)
      } catch { case e: Throwable =>
        // a query failing only at scale is this tool's most important
        // signal — report it and keep timing the rest
        println(s"[scale] $n FAILED: ${e.getMessage}")
        None
      }
    }
    println(f"[scale] TOTAL ${timings.map(_._2).sum}%.1fs over ${timings.size}/${Stressed.size} queries")
    spark.stop()
  }
}
