package graft.operators

import graft.functions.vec
import graft.{GQ, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection over `documents` / `embeddings` (north star).
  *
  * Four families, each a different scale/recall trade-off:
  *  - exact:    hash groupBy on content (TextOps.q_dedup_exact / fingerprint)
  *  - MinHash:  shingle → k min-hashes → LSH band buckets → candidate pairs.
  *    The only shuffles are the explode-side partial-min aggregation and the
  *    bucket self-join on band keys — never an all-pairs product, so the plan
  *    survives 100 TB (pairs are bounded by bucket collisions).
  *  - SimHash:  sign-aggregated word hashes → one 32-bit signature per doc;
  *    near-dups differ in few bits (banding by signature prefix buckets them).
  *  - n-gram Jaccard: exact set similarity, blocked by (lang, source) so the
  *    pair space is per-block quadratic, not corpus-quadratic; at 100 TB the
  *    block key becomes an LSH bucket from the MinHash pass.
  *
  * Signature/band values hash with Spark's xxhash64 — engine-specific, so the
  * MinHash/SimHash queries are declared without a DuckDB oracle (rows-only
  * check; outputs are always non-empty: one row per doc / top-k pairs). The
  * Jaccard and embedding queries are exact math and fully oracle-matched.
  */
object Dedup {

  /** Mersenne prime 2^31-1: (a*x+b) mod P stays well inside Long even under
    * ANSI overflow checking (a,x < 2^31 so a*x < 2^62). */
  private val P = 2147483647L
  private val K = 16

  /** Fixed affine coefficients for the K min-hash functions, derived from a
    * splitmix-style constant walk — deterministic across runs and JVMs. */
  private val coefs: Seq[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x += 0x9e3779b97f4a7c15L; var z = x; z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27; z }
    Seq.fill(K)((1L + math.floorMod(next(), P - 1), math.floorMod(next(), P)))
  }

  /** 3-word shingles of a text column (docs with <3 words shingle to the
    * whole text). `when` guards the transform so ANSI element_at never sees
    * an out-of-range index. */
  private def shingles(text: Column): Column = {
    val words = split(text, " ")
    when(size(words) >= 3,
      transform(sequence(lit(1), size(words) - 2), i =>
        concat_ws(" ",
          element_at(words, i), element_at(words, i + 1), element_at(words, i + 2))))
      .otherwise(array(text))
  }

  /** doc_id + K min-hash signature columns (sig0..sigK-1). One explode + one
    * grouped multi-min aggregation: the shuffle carries K longs per doc. */
  private def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val base = pmod(xxhash64(col("shingle")), lit(P))
    val mins = coefs.zipWithIndex.map { case ((a, b), j) =>
      min(pmod(base * a + b, lit(P))).as(s"sig$j")
    }
    Tables.t(s, d, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
  }

  val queries: Seq[GQ] = Seq(
    // Per-doc MinHash signature digest + 4 LSH band keys (bands of 4 rows).
    GQ(
      "q_dedup_minhash",
      (s, d) => {
        val sigs = minhashSignatures(s, d)
        val bands = (0 until 4).map { b =>
          xxhash64((0 until 4).map(r => col(s"sig${b * 4 + r}")): _*).as(s"band$b")
        }
        sigs.select(col("doc_id") +: (0 until 4).map(j => col(s"sig$j")) ++: bands: _*)
          .orderBy(col("doc_id"))
      },
      None
    ),
    // LSH candidate pairs: docs sharing at least one of the K min-hashes
    // (r=1, b=K banding — high recall), scored by estimated Jaccard =
    // fraction of equal signature positions. Top-20 deterministic.
    GQ(
      "q_dedup_minhash_pairs",
      (s, d) => {
        val sigs = minhashSignatures(s, d)
        val sigCols = (0 until K).map(j => col(s"sig$j"))
        val exploded = sigs.select(
          col("doc_id"),
          explode(arrays_zip(
            array((0 until K).map(j => lit(j)): _*).as("j"),
            array(sigCols: _*).as("v"))).as("h"))
          .select(col("doc_id"), col("h.j").as("j"), col("h.v").as("v"))
        val cand = exploded.as("a")
          .join(exploded.as("b"),
            col("a.j") === col("b.j") && col("a.v") === col("b.v") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
        val aSig = sigs.toDF("a_id" +: (0 until K).map(j => s"a_sig$j"): _*)
        val bSig = sigs.toDF("b_id" +: (0 until K).map(j => s"b_sig$j"): _*)
        val eq = (0 until K).map(j =>
          when(col(s"a_sig$j") === col(s"b_sig$j"), 1).otherwise(0))
          .reduce(_ + _)
        cand.join(aSig, "a_id").join(bSig, "b_id")
          .select(
            col("a_id"), col("b_id"),
            (eq.cast(DoubleType) / K).as("est_jaccard"))
          .orderBy(col("est_jaccard").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      None
    ),
    // 32-bit SimHash per document from term-frequency-weighted word hashes.
    GQ(
      "q_dedup_simhash",
      (s, d) => {
        val h = xxhash64(col("word"))
        val bitSums = (0 until 32).map { b =>
          sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"s$b")
        }
        val sig = (0 until 32).map { b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
        }.reduce(_ + _)
        Tables.t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id"))
          .agg(bitSums.head, bitSums.tail: _*)
          .select(
            col("doc_id"), sig.as("simhash"),
            shiftright(sig, 16).as("prefix_bucket"))
          .orderBy(col("doc_id"))
      },
      None
    ),
    // Exact word-set Jaccard within (lang, source) blocks — oracle-matched.
    // jaccard is a single IEEE division of two exact ints: bit-stable.
    GQ(
      "q_dedup_jaccard_words",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
          .select(
            col("doc_id"), col("lang"), col("source"),
            array_distinct(split(col("text"), " ")).as("ws"))
        val a = docs.toDF("a_id", "lang", "source", "a_ws")
        val b = docs.toDF("b_id", "lang", "source", "b_ws")
        a.join(b, Seq("lang", "source"))
          .filter(col("a_id") < col("b_id"))
          .select(
            col("a_id"), col("b_id"),
            (size(array_intersect(col("a_ws"), col("b_ws"))).cast(DoubleType) /
              size(array_union(col("a_ws"), col("b_ws"))).cast(DoubleType)).as("jaccard"))
          .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, lang, source,
             |  list_distinct(string_split(text, ' ')) AS ws FROM documents)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
             |  (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
             |FROM d a JOIN d b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |ORDER BY jaccard DESC, a_id, b_id LIMIT 20""".stripMargin)
    ),
    // Exact 3-gram (word-shingle) Jaccard within blocks — oracle-matched.
    GQ(
      "q_dedup_jaccard_ngram",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
          .select(
            col("doc_id"), col("lang"), col("source"),
            array_distinct(shingles(col("text"))).as("sh"))
        val a = docs.toDF("a_id", "lang", "source", "a_sh")
        val b = docs.toDF("b_id", "lang", "source", "b_sh")
        a.join(b, Seq("lang", "source"))
          .filter(col("a_id") < col("b_id"))
          .select(
            col("a_id"), col("b_id"),
            (size(array_intersect(col("a_sh"), col("b_sh"))).cast(DoubleType) /
              size(array_union(col("a_sh"), col("b_sh"))).cast(DoubleType)).as("jaccard"))
          .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, lang, source,
             |  list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
             |    THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
             |         i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
             |    ELSE [text] END) AS sh
             |  FROM documents)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |  (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
             |FROM d a JOIN d b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |ORDER BY jaccard DESC, a_id, b_id LIMIT 20""".stripMargin)
    ),
    // Embedding-cosine near-dup: top-20 most-similar pairs within a fixed
    // id-range block (constant work at any SF; the unblocked scale path is
    // the LSH/IVF machinery in Ann). Oracle-matched; ordered on the rounded
    // value with unique tie-break (R7).
    GQ(
      "q_dedup_embed",
      (s, d) => {
        val e = Tables.t(s, d, "embeddings").filter(col("vec_id") < 300)
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
        a.join(b, col("a_id") < col("b_id"))
          .select(
            col("a_id"), col("b_id"),
            round(vec.cosine(s, "ea", "eb"), 3).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("a_id"), col("b_id"))
          .limit(20)
      },
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                             CAST(b.embedding AS DOUBLE[])), 3) AS cos_sim
             |FROM embeddings a JOIN embeddings b
             |  ON a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300
             |ORDER BY cos_sim DESC, a_id, b_id LIMIT 20""".stripMargin)
    )
  )
}
