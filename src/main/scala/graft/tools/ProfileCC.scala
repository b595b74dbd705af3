package graft.tools

import graft.{Registry, Tables}
import org.apache.spark.sql.SparkSession

object ProfileCC {
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
    graft.operators.Dedup.ccDebug = true
    val t0 = System.nanoTime()
    val n = Registry.byName("q_dedup_components").run(spark, sfDir).count()
    println(f"[cc] TOTAL rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
