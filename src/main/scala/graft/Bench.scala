package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line, total + per-query seconds.
  *
  * Round-2 additions (VERDICT item 8 + ADVICE): the line self-describes its
  * conditions — cpus, JVM max/free memory — and carries a SECOND timed pass
  * per query (`queries2`/`total2`), so a cross-round delta can be told apart
  * from machine contention (round 1's identical code measured 31/40/65 s on
  * three hosts). A query that throws is reported in `failed` and excluded
  * from every total instead of silently distorting it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup pass: JIT compilation + parquet footer/codegen caches,
    // so the timed loop reports steady-state per-query cost instead of
    // charging whole-JVM warmup to whichever query happens to run first.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      graft.Caches.release(spark) // drain the tracked-persist registry too
    }
    def timedPass(): (Map[String, Double], Seq[String]) = {
      val failed = Seq.newBuilder[String]
      val times = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => failed += name; false }
        // operators may persist shared sub-relations (Dedup/Fingerprint);
        // each run builds fresh plan instances, so entries never help a
        // later query — drop them to keep memory flat across 81×3 runs
        spark.catalog.clearCache()
        graft.Caches.release(spark) // drain the tracked-persist registry too
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      (times, failed.result())
    }
    val (pass1, failed1) = timedPass()
    val (pass2, failed2) = timedPass()
    val failed = (failed1 ++ failed2).distinct.sorted
    def fmt(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def totalOf(m: Map[String, Double]) =
      m.collect { case (k, v) if !failed.contains(k) => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rt = Runtime.getRuntime
    println(
      s"""{"metric":"total","value":${totalOf(pass1)},"unit":"sec",""" +
        s""""queries":${fmt(pass1)},"sf":"$sfDir",""" +
        s""""total2":${totalOf(pass2)},"queries2":${fmt(pass2)},""" +
        s""""failed":$failedJson,"cpus":$cpus,""" +
        s""""jvm_max_mem_mb":${rt.maxMemory() / 1048576},""" +
        s""""jvm_free_mem_mb":${rt.freeMemory() / 1048576}}""")
    spark.stop()
  }
}
