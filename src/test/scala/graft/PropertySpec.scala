package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws the engine's semantics must uphold (SURVEY.md §5.2-3).
  *
  * Uses scalacheck generators sampled under fixed seeds (no scalatestplus
  * bridge in the offline cache), so failures are reproducible and each law
  * runs a bounded number of Spark jobs.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("union-distinct is idempotent and commutative (reference C2 law)") {
    val lists = Gen.listOfN(30, Gen.chooseNum(-5, 5))
    for ((a, b) <- samples(lists, 5).zip(samples(lists, 5).reverse)) {
      val da = a.toDF("k")
      val db = b.toDF("k")
      val ab = da.union(db).distinct().as[Int].collect().sorted.toSeq
      val ba = db.union(da).distinct().as[Int].collect().sorted.toSeq
      val abTwice = da.union(db).distinct().distinct().as[Int].collect().sorted.toSeq
      assert(ab === (a ++ b).distinct.sorted)
      assert(ab === ba)
      assert(ab === abTwice)
    }
  }

  test("cast-all-to-string is total and preserves row count (reference P7 law)") {
    val rowGen = Gen.zip(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.oneOf(Gen.const(Double.NaN), Gen.const(Double.PositiveInfinity),
        Gen.chooseNum(-1e18, 1e18)),
      Gen.asciiPrintableStr)
    for (rs <- samples(Gen.listOfN(20, rowGen), 5)) {
      val df = rs.toDF("a", "b", "c")
      val cast = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
      assert(cast.count() === rs.size.toLong)
      assert(cast.schema.fields.forall(_.dataType.typeName == "string"))
    }
  }

  test("exact-dedup output is a fixpoint and a subset (NS dedup law)") {
    val texts = Gen.listOfN(25, Gen.oneOf("x", "y y", "z z z", "w", "v v"))
    for (ts <- samples(texts, 5)) {
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def dedup(in: org.apache.spark.sql.DataFrame) =
        in.groupBy("text").agg(min("doc_id").as("doc_id"))
      val once = dedup(df).select("doc_id", "text")
      val twice = dedup(once).select("doc_id", "text")
      val a = once.collect().map(_.toSeq).toSet
      assert(a === twice.collect().map(_.toSeq).toSet)
      assert(a.subsetOf(df.select("doc_id", "text").collect().map(_.toSeq).toSet))
    }
  }

  test("decimal money math matches BigDecimal regardless of partitioning (R2)") {
    val cents = Gen.listOfN(40, Gen.chooseNum(-100000L, 100000L))
    for (cs <- samples(cents, 5)) {
      val doubles = cs.map(c => c.toDouble / 100.0)
      val expected = cs.map(BigDecimal(_)).sum / 100
      for (parts <- Seq(1, 3)) {
        val got = doubles.toDF("v").repartition(parts)
          .agg(C.sumDec2(col("v")).as("s")).as[Double].collect().head
        assert(BigDecimal(got) === expected, s"parts=$parts")
      }
    }
  }

  test("top-k is stable under input shuffling (R1 determinism)") {
    val rowGen = Gen.zip(Gen.chooseNum(1L, 8L), Gen.chooseNum(0, 999))
    for (rs <- samples(Gen.listOfN(30, rowGen), 5)) {
      val df = rs.distinct.toDF("k", "v") // distinct rows => unique tie-break
      def top(in: org.apache.spark.sql.DataFrame) =
        in.orderBy(col("v").desc, col("k")).limit(5).collect().map(_.toSeq).toSeq
      assert(top(df) === top(df.repartition(7)))
    }
  }
}
