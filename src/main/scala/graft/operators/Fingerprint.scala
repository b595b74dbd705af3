package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (the rolling-hash scheme from the MOSS
  * paper, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every k-gram, slide a
  * window of w consecutive k-gram hashes, keep each window's minimum — a
  * position-robust fingerprint set guaranteeing any shared run of ≥ w+k-1
  * tokens yields a shared fingerprint.
  *
  * Built with the engine's linear shingling shape (posexplode + window
  * lead/min — see Dedup's PERF NOTE; no per-element lambdas): one shuffle on
  * doc_id, per-doc sort, two window passes. At 100 TB the winnowed set is
  * ~2/(w+1) of the k-gram count per document, and downstream near-dup
  * candidate generation joins on fingerprint value exactly like MinHash
  * bands. Hash basis is xxhash64 — engine-specific ⇒ no DuckDB oracle
  * (rows-only; one output row per document).
  */
object Fingerprint {

  private val K = 3 // words per gram
  private val W = 4 // grams per winnow window

  /** (doc_id, pos, gram_hash) for docs with ≥ K words; shorter docs hash the
    * whole text as their single gram. */
  private def gramHashes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.t(s, d, "documents")
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("words"))
    val wPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val long = docs.filter(size(col("words")) >= K)
      .select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("word"),
          lead(col("word"), 1).over(wPos), lead(col("word"), 2).over(wPos)).as("gh"),
        lead(col("word"), K - 1).over(wPos).isNotNull.as("complete"))
      .filter(col("complete"))
      .drop("complete")
    val short = docs.filter(size(col("words")) < K)
      .select(col("doc_id"), lit(0).as("pos"), xxhash64(col("text")).as("gh"))
    long.union(short)
  }

  val queries: Seq[GQ] = Seq(
    // Per-doc winnowed fingerprint summary: fingerprint count + set digest.
    GQ(
      "q_text_winnow",
      (s, d) => {
        val wRoll = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(0, W - 1)
        val winnowed = gramHashes(s, d)
          .select(col("doc_id"), min(col("gh")).over(wRoll).as("fp"))
          .distinct()
        winnowed
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_fp"),
            min(col("fp")).as("fp_min"),
            // order-insensitive set digest: XOR of fingerprint hashes
            expr("bit_xor(fp)").as("fp_digest"))
          .orderBy(col("doc_id"))
      },
      None
    )
  )
}
