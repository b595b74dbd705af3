package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev probe: honest (cache-cleared) per-rep timing for one query, plus a
  * stage breakdown of the blocked-Jaccard pipeline — unlike Explain, every
  * rep starts from a cold catalog cache so numbers match Bench's regime.
  * Usage: runMain graft.tools.ProfileJaccard [queryName] [sfDir] [reps]
  */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_dedup_jaccard_ngram"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gq = Registry.byName(name)
    gq.run(spark, sfDir).count() // warmup (JIT, parquet footers)
    spark.catalog.clearCache()
    graft.Caches.release(spark) // drain the tracked-persist registry too
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = gq.run(spark, sfDir).count()
      println(f"[profile] rep$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      graft.Caches.release(spark) // drain the tracked-persist registry too
    }
    // stage breakdown of the shared shingle pipeline (cold cache each)
    import org.apache.spark.sql.functions._
    def timeIt(tag: String)(mk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = mk
      println(f"[profile] $tag%-28s rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      graft.Caches.release(spark) // drain the tracked-persist registry too
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    timeIt("kgram_rows") {
      graft.operators.Grams.kgramRows(docs, 3, Seq("lang", "source")).count()
    }
    timeIt("kgram_distinct_hashed") {
      graft.operators.Grams.kgramRows(docs, 3, Seq("lang", "source"))
        .select(col("lang"), col("source"), col("doc_id"),
          xxhash64(col("item")).as("item"))
        .distinct().count()
    }
    spark.stop()
  }
}
