package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.scalatest.funsuite.AnyFunSuite

/** The round-3 ADVICE contract: operator-internal persists are tracked and
  * `GQ.apply` releases them after the caller's action, so a library consumer
  * (notebook, Registry user) cannot accumulate cached relations across query
  * runs — without nuking caches the USER created.
  */
class CachesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cacheEmpty: Boolean =
    castToImpl(spark).sharedState.cacheManager.isEmpty

  test("GQ.apply releases operator-internal persists after the action") {
    spark.catalog.clearCache()
    assert(cacheEmpty)
    // q_dedup_components persists sym + per-round labels internally (the
    // surviving round-4 persists — jaccard's `tagged` cache was dropped
    // when KGrams made recompute cheaper than the cache barrier)
    val rows = Registry.byName("q_dedup_components")(spark, sf)(_.count())
    assert(rows > 0)
    assert(cacheEmpty, "internal persist must not outlive GQ.apply")
  }

  test("release drops only tracked entries, not user caches") {
    spark.catalog.clearCache()
    val user = spark.range(10).toDF("n").persist()
    user.count()
    Registry.byName("q_dedup_components")(spark, sf)(_.count())
    assert(!cacheEmpty, "the user's own cache must survive release")
    user.unpersist(blocking = true)
    assert(cacheEmpty)
  }

  test("persists made inside the caller's action outlive GQ.apply (round-4 ADVICE)") {
    // the scope stops capturing once the plan is built: a Caches.persist the
    // CALLBACK makes (e.g. SpotifyPipeline.run) lands in the session
    // registry, so GQ.apply's release cannot drop it out from under the user
    spark.catalog.clearCache()
    Registry.byName("q_sort_limit")(spark, sf) { df =>
      val mine = Caches.persist(spark.range(5).toDF("n"))
      mine.count()
      df.count()
    }
    assert(!cacheEmpty, "callback persist must survive the query's scope release")
    Caches.release(spark)
    assert(cacheEmpty, "…but it is session-registry tracked, so release reclaims it")
  }

  test("nested scopes stack: inner close restores the outer capture") {
    spark.catalog.clearCache()
    val outer = Caches.beginScope()
    try {
      val a = Caches.persist(spark.range(3).toDF("a")); a.count()
      val inner = Caches.beginScope()
      val b = Caches.persist(spark.range(4).toDF("b")); b.count()
      inner.release()
      // without the save/restore, this persist would leak to the session
      // registry and outer.release below would strand it in the cache
      val c = Caches.persist(spark.range(5).toDF("c")); c.count()
    } finally outer.release()
    assert(cacheEmpty, "outer scope must reclaim persists made after inner release")
  }
}
