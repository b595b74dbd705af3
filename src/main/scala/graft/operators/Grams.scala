package graft.operators

import graft.functions.KGrams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The one k-gram builder, shared by Dedup shingles, TextOps bigrams,
  * Curation vocab/repetition/contamination grams, and Fingerprint gram
  * hashes.
  *
  * Round 4: gram assembly is the native codegen'd [[graft.functions.KGrams]]
  * expression — one scan-side projection, ZERO shuffles. The previous shape
  * (split → posexplode → window `lead` reassembly) existed to dodge the
  * round-1 O(words²) lambda-inlining trap (Dedup's PERF NOTE), but paid a
  * full corpus exchange + per-doc sort for the window in every consumer;
  * the native expression splits once per row inside `compute`, so neither
  * the quadratic trap nor the shuffle exists. Emitted rows are identical:
  * (doc_id, carry..., pos, item) with pos the gram's starting word index,
  * and sub-k-word docs contributing their whole text as the single item at
  * pos 0.
  */
object Grams {

  def kgramRows(docsWithText: DataFrame, k: Int, carry: Seq[String]): DataFrame = {
    KGrams.register(docsWithText.sparkSession)
    docsWithText.select(
      col("doc_id") +: carry.map(col) :+
        posexplode(expr(s"kgrams(`text`, $k)")).as(Seq("pos", "item")): _*)
  }
}
