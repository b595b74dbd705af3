ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spotifyappetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Round-13 JVM posture, measured on the full 230-query bench (see
  // OPTIMIZATION_r13.md "Engine-wide"):
  //  - codegen.cache.maxEntries (STATIC conf, so set JVM-wide here): the
  //    Spark default caches only 100 generated classes; the big declared
  //    plans alone compile 70-120 whole-stage units per run, so every run
  //    of every query recompiled its codegen from scratch (measured: ~8 s
  //    of Janino per llm-pipeline run; 0 recompiles at 20k entries).
  //    Size-independent driver-health knob, not a data-size tunable.
  //  - ParallelGC: under G1 the bench JVM hit 30-45 s full-GC storms on
  //    random queries (measured via per-task jvmGCTime), the source of the
  //    rounds-9..12 "box noise" retiming churn; with ParallelGC the same
  //    profile shows 0.8-2.8 s GC per run and pass_skew fell to 1.01.
  "-Dspark.sql.codegen.cache.maxEntries=20000",
  "-XX:+UseParallelGC",
  //  - canChangeCachedPlanOutputPartitioning: lets AQE coalesce the output
  //    partitioning of cached plans (off by default only to keep cached
  //    layouts stable for consumers that depend on partition COUNT; ours
  //    depend on hash CLUSTERING, which coalescing preserves). Without it
  //    every Caches.persist materialized at the static 32-partition
  //    shuffle layout however tiny the relation, and each downstream
  //    exchange then wrote map×reduce tiny shuffle files — thread dumps
  //    showed executor task time dominated by BypassMergeSortShuffleWriter
  //    file churn (q_graph_kcore: 90 task-seconds for a 53k-row peel).
  //    With AQE sizing cached output by bytes (64 MB advisory), model-sized
  //    caches collapse to O(1) partitions and corpus-sized ones keep their
  //    parallelism — the scale-adaptive behavior guide §2 prescribes.
  "-Dspark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true",
)
