package graft.operators

import graft.{GQ, Tables, XHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
// (winnowed/sqlWinnowCte are shared by the summary and pairs queries below)

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
  * bands. Hash basis is the cross-engine [[graft.XHash]] md5-prefix (round
  * 2), so the fingerprint sets are fully oracle-checked — count, min, and
  * the order-insensitive XOR set digest must all match DuckDB bit for bit.
  */
object Fingerprint {

  private val K = 3 // words per gram
  private val W = 4 // grams per winnow window

  /** (doc_id, pos, gh) gram hashes via the shared linear builder; docs with
    * < K words hash the whole text as their single gram. The gram hash is
    * h60 of the space-joined gram string — the exact string the DuckDB twin
    * hashes. */
  private def gramHashes(s: SparkSession, d: String): DataFrame =
    Grams.kgramRows(Tables.t(s, d, "documents"), K, Seq())
      .select(col("doc_id"), col("pos"), XHash.h60(col("item")).as("gh"))

  /** The winnowed fingerprint set: (doc_id, fp) distinct. FULL windows
    * only, per the MOSS scheme — a trailing partial window would always
    * select the doc's final gram as a spurious fingerprint. Docs with fewer
    * than W grams keep their pos-0 window (the minimum over everything they
    * have). */
  private def winnowed(s: SparkSession, d: String): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id"))
    val wRoll = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, W - 1)
    gramHashes(s, d)
      .withColumn("max_pos", max(col("pos")).over(wDoc))
      .withColumn("fp", min(col("gh")).over(wRoll))
      .filter(col("pos") + (W - 1) <= col("max_pos") ||
        (col("max_pos") < W - 1 && col("pos") === 0))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** DuckDB twin of [[winnowed]], ending in a relation `f(doc_id, fp)`. */
  private def sqlWinnowCte: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws, text
       |  FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(ws) >= $K
       |  THEN list_transform(range(1, len(ws) - ${K - 2}),
       |       i -> array_to_string(ws[i:i+${K - 1}], ' '))
       |  ELSE [text] END AS grams FROM d),
       |gh AS (SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
       |  ${XHash.sqlH60("unnest(grams)")} AS gh FROM g),
       |w AS (SELECT doc_id, pos, gh,
       |  MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp,
       |  MAX(pos) OVER (PARTITION BY doc_id) AS max_pos FROM gh),
       |f AS (SELECT DISTINCT doc_id, fp FROM w
       |  WHERE pos + ${W - 1} <= max_pos
       |     OR (max_pos < ${W - 1} AND pos = 0))""".stripMargin

  val queries: Seq[GQ] = Seq(
    // Per-doc winnowed fingerprint summary: fingerprint count + set digest.
    GQ(
      "q_text_winnow",
      (s, d) => {
        winnowed(s, d)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_fp"),
            min(col("fp")).as("fp_min"),
            // order-insensitive set digest: XOR of fingerprint hashes
            expr("bit_xor(fp)").as("fp_digest"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$sqlWinnowCte
             |SELECT doc_id, COUNT(*) AS n_fp, MIN(fp) AS fp_min,
             |  bit_xor(fp) AS fp_digest
             |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    // Winnow-based near-dup candidates (round 2): pairs sharing ≥1 winnowed
    // fingerprint, ranked by shared-fingerprint count — MOSS's own candidate
    // rule, and the third independent candidate generator beside MinHash
    // bands and Jaccard prefix items. The self-join keys on fingerprint
    // VALUE, so pair volume is bounded by fingerprint collisions (the
    // winnowed set is ~2/(W+1) of the grams), never all-pairs — the same
    // scale posture as q_dedup_minhash_pairs. Fully oracle-matched on the
    // h60 basis.
    GQ(
      "q_dedup_winnow_pairs",
      (s, d) => {
        // both self-join sides share the winnow lineage through one
        // ReusedExchange — a persist here measured SLOWER at sf0.1
        // (1.5-2.4s vs 2.2-2.6s cached; round-3 A/B): the cache-write
        // barrier costs more than the saved recompute
        val f = winnowed(s, d)
        f.as("a")
          .join(f.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("shared_fp"))
          .orderBy(col("shared_fp").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      Some(s"""$sqlWinnowCte
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  COUNT(*) AS shared_fp
             |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY a.doc_id, b.doc_id
             |ORDER BY shared_fp DESC, a_id, b_id LIMIT 20""".stripMargin)
    )
  )
}
