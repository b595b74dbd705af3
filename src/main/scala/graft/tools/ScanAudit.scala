package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Registry-wide multi-scan audit: for every declared query, count how many
  * parquet scan SITES each source table contributes to the executed plan.
  * A count > 2 per table almost always means a multi-consumer relation is
  * recomputing its lineage once per consumer — the round-5 pass found
  * q_events_concurrency (3× events), q_stats_bootstrap (2× orders), and
  * q_retrieval_queryexp (25 sites!) exactly this way; `graft.Caches.persist`
  * is the standard fix. Run:
  *
  *   sbt -batch "runMain graft.tools.ScanAudit [sfDir] [threshold]"
  *
  * Prints one line per (query, table) at or above the threshold (default 3),
  * then a summary. Plans are built (and bounded driver fetches run) at the
  * given SF — use sf0.001.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val threshold = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loc = "Location: InMemoryFileIndex \\[[^\\]]*/(\\w+)\\.parquet".r
    var flagged = 0
    for (gq <- Registry.all) {
      try {
        // formatted mode: the simple plan string collapses reused/adaptive
        // subtrees and silently under-counts scan sites
        val p = gq.run(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val counts = loc.findAllMatchIn(p).map(_.group(1)).toSeq
          .groupBy(identity).view.mapValues(_.size).toSeq
        for ((table, n) <- counts.sortBy(-_._2) if n >= threshold) {
          flagged += 1
          println(f"[scan-audit] ${gq.name}%-28s $table%-12s x$n")
        }
      } catch {
        case e: Exception =>
          println(s"[scan-audit] ${gq.name} ERROR ${e.getMessage.take(80)}")
      } finally {
        graft.Caches.release(spark)
        spark.catalog.clearCache()
      }
    }
    println(s"[scan-audit] DONE ${Registry.all.size} queries, " +
      s"$flagged (query, table) pairs at >= $threshold scan sites")
    spark.stop()
  }
}
