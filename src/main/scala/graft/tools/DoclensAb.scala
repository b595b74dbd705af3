package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only A/B for writePostings' doclens derivation (round 10, VERDICT
  * item 6): the round-9 A/B ran at toy geometry (sf0.1, 8 buckets — the
  * bucketed read capped the doclens agg at 8 tasks) and kept the
  * lineage-replay form on that evidence. This re-runs the comparison at
  * the geometry the question is actually about: a ×N-replicated document
  * corpus and buckets ≥ 32.
  *
  * Forms timed (full writePostings equivalent: postings write + doclens
  * write each run):
  *  - `replay`: doclens aggregates the idx LINEAGE — a second corpus pass
  *    (scan + explode + (doc, word) agg).
  *  - `table`: doclens aggregates the JUST-WRITTEN postings table — an
  *    index-sized read + one doc-keyed agg.
  *
  * Usage: runMain graft.tools.DoclensAb [sfDir] [copies] [buckets] [reps]
  */
object DoclensAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val buckets = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ×copies documents, ids re-offset per copy (the ScaleStress recipe)
    val base = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val off = 1000000L
    val corpus = (0 until copies).map { i =>
      base.select((col("doc_id") + lit(i * off)).as("doc_id"), col("text"))
    }.reduce(_.unionByName(_))
    println(s"[doclens] corpus rows=${corpus.count()} copies=$copies buckets=$buckets")

    def idxOf(c: DataFrame): DataFrame = c
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

    def runForm(form: String): Double = {
      val prefix = s"dlab_$form"
      val t0 = System.nanoTime()
      val idx = idxOf(corpus)
      graft.sources.Warehouse.writeBucketed(
        idx, s"${prefix}_postings", "word", buckets)
      graft.sources.Warehouse.dropStale(spark, s"${prefix}_doclens")
      val dlSrc = form match {
        case "replay" => idx
        case "table"  => spark.table(s"${prefix}_postings")
      }
      dlSrc.groupBy(col("doc_id"))
        .agg(sum(col("tf")).cast(LongType).as("dl"))
        .write.mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable(s"${prefix}_doclens")
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup of both forms, then alternating timed reps
    Seq("replay", "table").foreach(runForm)
    val times = (1 to reps).flatMap { r =>
      Seq("replay", "table").map(f => (f, r, runForm(f)))
    }
    times.foreach { case (f, r, t) =>
      println(f"[doclens] $f%-6s rep$r +$t%.2fs")
    }
    Seq("replay", "table").foreach { f =>
      val ts = times.filter(_._1 == f).map(_._3)
      println(f"[doclens] $f%-6s min=${ts.min}%.2fs median=${ts.sorted.apply(ts.size / 2)}%.2fs")
    }
    // equality check: both doclens tables identical
    val a = spark.table("dlab_replay_doclens")
    val b = spark.table("dlab_table_doclens")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[doclens] forms_equal=${diff == 0}")
    spark.stop()
  }
}
