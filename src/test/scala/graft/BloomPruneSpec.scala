package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom semi-join pruning: no false negatives (the join result through the
  * pruned fact equals the unpruned join), and the filter actually removes
  * non-joining rows on a selective build side.
  */
class BloomPruneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pruned join result equals exact join; non-joining rows are dropped") {
    val fact = (1L to 1000L).map(i => (i, i % 97)).toDF("k", "payload")
    val build = Seq(3L, 11L, 500L, 999L).toDF("k")

    val pruned = BloomPrune.prune(fact, "k", build, "k", expectedKeys = 16)
    val exact = fact.join(build, "k").orderBy("k").collect().toSeq
    val viaPruned = pruned.join(build, "k").orderBy("k").collect().toSeq
    assert(viaPruned === exact, "Bloom pruning must never drop a joining row")

    val kept = pruned.count()
    assert(kept >= 4, "all 4 matching keys must survive")
    assert(kept < 1000, s"a 4-key filter should prune most of 1000 rows (kept $kept)")
  }

  test("q_join_bloom_pruned: probe filters the lineitem scan, no Exchange below it") {
    val plan = Registry.byName("q_join_bloom_pruned")
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toIndexedSeq
    val probeAt = lines.indexWhere(_.contains("might_contain"))
    assert(probeAt >= 0, s"runtime-filter probe missing from plan:\n$plan")
    val scanAt = lines.indexWhere(_.contains("lineitem.parquet"), probeAt)
    assert(scanAt > probeAt, s"no lineitem scan below the probe:\n$plan")
    val between = lines.slice(probeAt + 1, scanAt)
    assert(!between.exists(_.contains("Exchange")),
      s"probe must sit scan-side (found Exchange between filter and scan):\n$plan")
  }

  test("sizing: ~1% fpp on a disjoint probe set") {
    val build = (1L to 1000L).toDF("k")
    val probe = (100001L to 110000L).toDF("k") // disjoint from build
    val kept = BloomPrune.prune(probe, "k", build, "k", expectedKeys = 1000).count()
    // every kept row is a false positive; 10k probes at fpp=0.01 -> ~100,
    // allow generous slack for hash clustering
    assert(kept < 500, s"false-positive rate blew past sizing (kept $kept of 10000)")
  }
}
