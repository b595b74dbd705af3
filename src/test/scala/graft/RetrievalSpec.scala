package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed goldens for the round-4 retrieval/indexing queries plus
  * the declared salted aggregation, on MiniData (values derived on paper
  * from the fixture rows — see TestSpark.scala for the corpus).
  */
class RetrievalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = MiniData.dir

  private def rows(name: String): Seq[Seq[Any]] =
    Registry.byName(name).run(spark, dir).collect().toSeq.map(_.toSeq)

  test("q_text_tfidf: tf/df salience ranks corpus-unique words first") {
    val r = rows("q_text_tfidf")
    // docs 1,2 (6 shared words, df=2, score 0.5): top-3 word-asc = fast,key,merge
    // doc 3: der/hund/und are doc-unique (score 1.0), beat the df=2 die/katze/…
    // doc 5 has only two words -> two rows; doc 6: heute unique, then die,hier
    assert(r.size === 17)
    assert(r.filter(_.head == 3L) === Seq(
      Seq(3L, 1L, "der", 1L, 1L, 1.0),
      Seq(3L, 2L, "hund", 1L, 1L, 1.0),
      Seq(3L, 3L, "und", 1L, 1L, 1.0)))
    assert(r.filter(_.head == 5L) === Seq(
      Seq(5L, 1L, "two", 1L, 1L, 1.0),
      Seq(5L, 2L, "words", 1L, 1L, 1.0)))
    assert(r.filter(_.head == 6L) === Seq(
      Seq(6L, 1L, "heute", 1L, 1L, 1.0),
      Seq(6L, 2L, "die", 1L, 2L, 0.5),
      Seq(6L, 3L, "hier", 1L, 2L, 0.5)))
    assert(r.filter(_.head == 1L).map(_(2)) === Seq("fast", "key", "merge"))
  }

  test("q_index_postings: sorted gram posting lists, df-desc head, cap") {
    val r = rows("q_index_postings")
    // 7 df=2 grams (docs 1,2 share 4; docs 3,6 share 3) + 11 df=1 = 18 rows
    assert(r.size === 18)
    assert(r.take(3) === Seq(
      Seq("die katze ist", 2L, "3,6"),
      Seq("fast key order", 2L, "1,2"),
      Seq("ist nicht hier", 2L, "3,6")))
    assert(r(6) === Seq("the fast key", 2L, "1,2"))
    // df=1 tail starts alphabetically; doc 5 (<3 words) indexes whole text
    assert(r(7) === Seq("casa que la", 1L, "4"))
    assert(r.contains(Seq("two words", 1L, "5")))
    // every posting list is ascending and df == its length
    r.foreach { row =>
      val ids = row(2).asInstanceOf[String].split(",").map(_.toLong).toSeq
      assert(ids === ids.sorted, s"unsorted postings in $row")
      assert(ids.size === row(1).asInstanceOf[Long])
    }
  }

  test("zvalue: Morton interleave puts x on even bits, y on odd bits") {
    import spark.implicits._
    val pairs = Seq((1L, 1L), (2L, 2L), (3L, 2L), (1023L, 0L), (0L, 1023L))
      .toDF("x", "y")
    val z = pairs
      .select(operators.Layout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // hand-interleaved: (1,1)->0b11, (2,2)->0b1100, (3,2)->0b1101,
    // (1023,0)->alternating-even = (4^10-1)/3, (0,1023)->twice that
    assert(z === Seq(3L, 12L, 13L, 349525L, 699050L))
  }

  test("q_layout_zorder: bucket envelopes cover every row and stay rectangular") {
    val r = rows("q_layout_zorder")
    // MiniData keys are tiny (x<=3, y<=2) so all rows share z-bucket 0
    assert(r === Seq(Seq(0L, 8L, 1L, 3L, 1L, 2L)))
  }

  test("q_agg_skew_salted: salting is invisible — equals the plain aggregation") {
    val r = rows("q_agg_skew_salted")
    assert(r === Seq(
      Seq("click", 1L, 0.25),
      Seq("error", 1L, 1.50),
      Seq("purchase", 2L, 285.21),
      Seq("signup", 1L, 0.00),
      Seq("view", 1L, 2.75)))
    // cross-check against the unsalted plan on the same session
    val plain = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        C.sumDec2(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
      .collect().toSeq.map(_.toSeq)
    assert(r === plain)
  }
}
