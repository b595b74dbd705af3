package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Contract invariants over the whole declared surface (SURVEY.md §2.5/§2.6)
  * plus a full sweep: every query must run on the MiniData tables.
  */
class RegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = MiniData.dir

  test("registry has unique, well-formed names and no colliding oracles") {
    assert(Registry.all.map(_.name).distinct.size === Registry.all.size)
    assert(Registry.all.forall(_.name.startsWith("q_")))
  }

  test("SparkEntry adapters expose the registry consistently") {
    assert(SparkEntry.queries.keySet === Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ===
      Registry.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("oracle SQL only references driver table names") {
    val tables =
      "region nation customer supplier part orders lineitem events documents embeddings"
        .split(" ")
    for (gq <- Registry.all; sql <- gq.oracle) {
      val lower = sql.toLowerCase
      assert(tables.exists(lower.contains(_)), s"${gq.name} oracle names no table")
    }
  }

  // The driver's compare sorts columns BY NAME before hashing — duplicate or
  // case-colliding names would silently scramble it.
  test("every query yields distinct, lowercase column names") {
    for (gq <- Registry.all) {
      val cols = gq.run(spark, dir).columns
      assert(cols.map(_.toLowerCase).distinct.size === cols.size, gq.name)
      assert(cols.forall(c => c == c.toLowerCase), s"${gq.name}: $cols")
    }
  }

  test("every query runs on MiniData and is deterministic across reruns") {
    for (gq <- Registry.all) {
      val a: Seq[Row] = gq.run(spark, dir).collect().toSeq
      val b: Seq[Row] = gq.run(spark, dir).collect().toSeq
      assert(a === b, s"${gq.name} nondeterministic")
    }
  }

  test("queries declared without oracle SQL never return empty (rows-only gate)") {
    for (gq <- Registry.all if gq.oracle.isEmpty) {
      assert(gq.run(spark, dir).count() > 0, s"${gq.name} must be non-empty")
    }
  }

  // The accidental-quadratic net (round 5): no declared query may ever plan
  // a CartesianProduct — Spark only picks that operator for a non-broadcast
  // cross join, which at 100 TB is a corpus² shuffle no matter how small it
  // looks on MiniData. Deliberate 1-row stats joins come out as
  // BroadcastNestedLoopJoin (allowed); a lost join condition or a stats
  // relation that stopped broadcasting lands here first.
  test("no query plans a CartesianProduct (global sweep)") {
    for (gq <- Registry.all) {
      val p = gq.run(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${gq.name} plans a CartesianProduct:\n$p")
    }
  }

  test("entry flagship returns rows (t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
