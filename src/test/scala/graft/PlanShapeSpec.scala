package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression pins for the scale properties the engine claims
  * (SURVEY §7.5): projection pruning and predicate pushdown reach the
  * parquet scan, small dimensions broadcast, and top-k never globally sorts.
  * String-level assertions on the executed plan — cheap, and they fail the
  * moment a refactor silently loses a pushdown.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Registry.byName(q).run(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_projection: column pruning reaches the parquet scan") {
    val p = plan("q_scan_projection")
    assert(p.contains("ReadSchema"), p)
    // a 4-column projection must not drag unread measures through the scan
    assert(!p.contains("l_discount") && !p.contains("l_shipdate"),
      s"scan reads columns the query never uses:\n$p")
  }

  test("q_filter_predicate: both predicates push down to the scan") {
    val p = plan("q_filter_predicate")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag equality not pushed:\n$p")
    // the plan printer truncates long filter lists, so match the predicate
    // head rather than its full literal
    assert(p.contains("GreaterThan(l_quantity"),
      s"quantity range not pushed:\n$p")
  }

  test("q_join_broadcast: the small dimension side broadcasts") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("top-k queries use TakeOrderedAndProject, never a global sort") {
    for (q <- Seq("q_sort_limit", "q_text_ngram_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost its top-k plan:\n$p")
    }
  }

  test("q_contamination: the benchmark side broadcasts; the corpus never shuffles into the join") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), s"benchmark join must broadcast:\n$p")
  }
}
