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
    // q_dedup_jaccard_words persists its `tagged` relation internally (the
    // one surviving round-3 persist — five consumers above a join lineage)
    val rows = Registry.byName("q_dedup_jaccard_words")(spark, sf)(_.count())
    assert(rows > 0)
    assert(cacheEmpty, "internal persist must not outlive GQ.apply")
  }

  test("release drops only tracked entries, not user caches") {
    spark.catalog.clearCache()
    val user = spark.range(10).toDF("n").persist()
    user.count()
    Registry.byName("q_dedup_jaccard_words")(spark, sf)(_.count())
    assert(!cacheEmpty, "the user's own cache must survive release")
    user.unpersist(blocking = true)
    assert(cacheEmpty)
  }
}
