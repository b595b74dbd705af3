package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one linear k-gram builder (split once → posexplode → window lead),
  * shared by Dedup shingles, TextOps bigrams, and Fingerprint gram hashes —
  * the shape mandated by the PERF NOTE on Dedup: per-element lambdas over
  * `split(text)` are O(words²)/doc because Catalyst inlines the split into
  * the lambda and the explode-side pushed filters.
  */
object Grams {

  /** One row per k-gram of `text`: (doc_id, carry..., pos, item), where
    * `gram` builds the item from the k word columns in order and documents
    * with fewer than k words contribute a single row `short(text)` at pos 0.
    * `pos` is the gram's starting word index (dense 0..len-k for long docs).
    */
  def kgramRows(
      docsWithText: DataFrame,
      k: Int,
      carry: Seq[String],
      gram: Seq[Column] => Column,
      short: Column => Column): DataFrame = {
    val docs = docsWithText.select(
      col("doc_id") +: carry.map(col) :+ col("text") :+
        split(col("text"), " ").as("words"): _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wordCols = (0 until k).map(i =>
      if (i == 0) col("word") else lead(col("word"), i).over(w))
    val long = docs.filter(size(col("words")) >= k)
      .select(col("doc_id") +: carry.map(col) :+
        posexplode(col("words")).as(Seq("pos", "word")): _*)
      .select(col("doc_id") +: carry.map(col) :+ col("pos") :+
        gram(wordCols).as("item") :+ wordCols.last.isNotNull.as("complete"): _*)
      .filter(col("complete"))
      .drop("complete")
    val shortDocs = docs.filter(size(col("words")) < k)
      .select(col("doc_id") +: carry.map(col) :+ lit(0).as("pos") :+
        short(col("text")).as("item"): _*)
    long.union(shortDocs)
  }
}
