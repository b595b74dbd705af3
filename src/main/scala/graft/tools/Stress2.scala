package graft.tools

import java.nio.file.{Files, Paths}

import graft.Registry
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 targeted stress probes, complementing [[ScaleStress]] (whose 10×
  * replication duplicates every document verbatim — a corpus whose TRUE
  * near-dup pair count grows quadratically, so it measures output growth,
  * not candidate-generation growth).
  *
  * JaccardBlockStress isolates what the round-1 verdict asked to prove:
  * candidate volume vs BLOCK SIZE. Each replica copy suffixes every word
  * with its copy index, so (lang, source) blocks grow ×k while cross-copy
  * similarity is zero and the ≥ Tau output grows only linearly (the base
  * pairs, once per copy). A quadratic candidate generator (the old per-block
  * all-pairs) scales t ∝ k²; the prefix-filter join should stay near-linear.
  *
  * IntervalSkewStress builds the thundering-herd hour the verdict flagged
  * for q_join_interval: every user gets a session inside ONE hour bucket,
  * so that bucket's equi-join candidate volume is C(users, 2) — the
  * worst-case key skew for the bucketed interval join. AQE's skew-join
  * splitting is expected to spread the hot bucket; the probe measures
  * whether it does (if not, Skew.saltedJoin is the tool to wire in).
  */
object JaccardBlockStress {
  def main(args: Array[String]): Unit = {
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2, 4, 8)
    val spark = Stress2.session()
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val maxId = base.agg(max("doc_id")).head.getLong(0) + 1
    for (k <- copiesList) {
      val dst = s"/tmp/graft_jacblock_x$k"
      val marker = Paths.get(dst, "_COMPLETE")
      if (!Files.exists(marker)) {
        Files.createDirectories(Paths.get(dst))
        (0 until k).map { i =>
          base
            .withColumn("doc_id", col("doc_id") + lit(i * maxId))
            // copy-distinct vocabulary: every word tagged with its copy id,
            // so blocks grow ×k with zero cross-copy item overlap
            .withColumn("text",
              array_join(transform(split(col("text"), " "),
                w => concat(w, lit(s"_$i"))), " "))
        }.reduce(_ unionByName _)
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")
        Files.createFile(marker)
      }
      for (q <- Seq("q_dedup_jaccard_words", "q_dedup_jaccard_ngram")) {
        Registry.byName(q).run(spark, dst).count() // warm
        spark.catalog.clearCache() // drop per-plan persists between runs
        val t0 = System.nanoTime()
        val rows = Registry.byName(q).run(spark, dst).count()
        println(f"[jacblock] x$k $q%-24s rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

object IntervalSkewStress {
  def main(args: Array[String]): Unit = {
    val spark = Stress2.session()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dst = "/tmp/graft_intervalskew"
    val marker = Paths.get(dst, "_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(dst))
      val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val maxId = base.agg(max("event_id")).head.getLong(0) + 1
      val hotHourNs = 1704067200L * 1000000000L // one fixed hour bucket
      // two events per user inside the SAME hour -> a >=2-event session for
      // every user overlapping one bucket (offsets keep user events distinct)
      val users = base.select(col("user_id")).distinct()
      val hot = users
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("user_id"))))
        .select(
          (col("r") + lit(maxId)).as("event_id"),
          (lit(hotHourNs) + col("user_id") % 1000 * 1000000L).as("ts"),
          col("user_id"),
          lit("view").as("event_type"),
          lit(1.0).as("value"),
          lit("""{"k": 1}""").as("props"))
      val hot2 = hot
        .withColumn("event_id", col("event_id") + lit(maxId))
        .withColumn("ts", col("ts") + lit(60L * 1000000000L))
      base.unionByName(hot).unionByName(hot2)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
      Files.createFile(marker)
      val n = users.count()
      println(s"[intervalskew] hot bucket holds ~$n concurrent sessions" +
        s" (~${n * (n - 1) / 2} candidate pairs)")
    }
    Registry.byName("q_join_interval").run(spark, dst).count() // warm
    val t0 = System.nanoTime()
    val rows = Registry.byName("q_join_interval").run(spark, dst).count()
    println(f"[intervalskew] q_join_interval rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

private object Stress2 {
  def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
