package graft.operators

import graft.{GQ, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis + exact-dedup operators over the `documents` table — the
  * LLM-training-pipeline surface (north star), absent from the reference
  * (its closest text op is the array→string flatten at
  * /root/reference/spotify-etl.py:199).
  *
  * Scale posture (round 6): `q_dedup_exact` / `q_dedup_cluster` cluster the
  * exchange on `xxhash64(text)` — an 8-byte shuffle key — and confirm true
  * text equality in-partition by aggregating on (digest, text): grouping by
  * (h, text) IS grouping by text (h is a function of text), so the result
  * is bit-identical to the naive form while the exchange never hashes,
  * compares, or sorts megabyte keys (see [[graft.operators.Dedup.digestClustered]]).
  * Text bytes still travel once as aggregation PAYLOAD — exact dedup cannot
  * confirm equality without the bytes meeting; a pipeline willing to trust
  * a 128-bit digest keys on `q_text_fingerprint`'s md5 instead and moves no
  * text at all. `q_text_tokens` is explode → partial hash agg, so the
  * shuffle carries (word, partial count), bounded by vocabulary size, not
  * corpus size.
  */
object TextOps {

  /** Tiny stopword list; present in the corpus vocabulary ("the", "a"). */
  private[operators] val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** THE quality gate — keep docs with a sane whitespace-token length band
    * and a bounded stopword ratio. One definition shared by
    * `q_quality_filter`, `q_curation_pipeline`'s first stage, and
    * [[graft.operators.LlmPipeline]]'s s1 (round-7 ADVICE: the three copies
    * could silently drift, breaking the pipeline's claim that its s1
    * applies q_quality_filter's exact gates). Pure scan-side predicates —
    * int comparisons plus one exact division. */
  private[operators] def qualityGate: Column = {
    val words = split(col("text"), " ")
    val stops = filter(words, w => w.isInCollection(Stopwords))
    size(words).between(20, 80) &&
      (size(stops).cast(DoubleType) / size(words).cast(DoubleType)) <= 0.3
  }

  /** Marker tokens per candidate language for the lang-id heuristic. */
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "es", "una"))

  val queries: Seq[GQ] = Seq(
    GQ(
      "q_dedup_exact",
      (s, d) =>
        Dedup.digestClustered(Tables.t(s, d, "documents"))
          .groupBy(col("h"), col("text"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
          .orderBy(col("doc_id")),
      Some("""SELECT MIN(doc_id) AS doc_id FROM documents
             |GROUP BY text ORDER BY doc_id""".stripMargin)
    ),
    GQ(
      "q_text_tokens",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20),
      Some("""SELECT word, COUNT(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin)
    ),
    GQ(
      "q_text_lang",
      (s, d) =>
        Tables.t(s, d, "documents")
          .filter(col("lang").isin("en", "es"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, COUNT(*) AS cnt FROM documents
             |WHERE lang IN ('en', 'es')
             |GROUP BY lang, source ORDER BY lang, source""".stripMargin)
    ),
    // Quality scoring: token count, char length, stopword ratio. The ratio is
    // a single IEEE division of two exact integers — bit-stable cross-engine.
    GQ(
      "q_text_quality",
      (s, d) => {
        val words = split(col("text"), " ")
        val stops = filter(words, w => w.isInCollection(Stopwords))
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            size(words).cast(LongType).as("n_words"),
            length(col("text")).cast(LongType).as("n_chars"),
            size(stops).cast(LongType).as("n_stop"),
            (size(stops).cast(DoubleType) / size(words).cast(DoubleType)).as("stop_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |len(string_split(text, ' ')) AS n_words,
              |length(text) AS n_chars,
              |len(list_filter(string_split(text, ' '),
              |  w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
              |CAST(len(list_filter(string_split(text, ' '),
              |  w -> w IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE)
              |  / len(string_split(text, ' ')) AS stop_ratio
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // Token counting two ways: whitespace split vs a BPE-ish regex token pass
    // ([a-z0-9]+ runs), plus chars-per-token (single division, bit-stable).
    GQ(
      "q_text_token_count",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("ws_tokens"),
            size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
              .cast(LongType).as("re_tokens"),
            (length(col("text")).cast(DoubleType) /
              size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
                .cast(DoubleType)).as("chars_per_token"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |len(string_split(text, ' ')) AS ws_tokens,
             |len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
             |CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '[a-z0-9]+'))
             |  AS chars_per_token
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // Language-ID heuristic: marker-token hit counts per candidate language
    // with a fixed-precedence argmax. (On this synthetic corpus every doc is
    // English-ish word soup, so the interesting output is the score columns;
    // the argmax machinery is what a real lang-id pass runs per document.)
    GQ(
      "q_text_langid",
      (s, d) => {
        val words = split(col("text"), " ")
        def hits(markers: Seq[String]) =
          size(filter(words, w => w.isInCollection(markers))).cast(LongType)
        val sEn = hits(LangMarkers("en"))
        val sDe = hits(LangMarkers("de"))
        val sEs = hits(LangMarkers("es"))
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            sEn.as("s_en"), sDe.as("s_de"), sEs.as("s_es"),
            when(sEn >= sDe && sEn >= sEs, "en")
              .when(sDe >= sEs, "de")
              .otherwise("es").as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        def h(lang: String) =
          s"len(list_filter(string_split(text, ' '), w -> w IN (${LangMarkers(lang).map(w => s"'$w'").mkString(", ")})))"
        s"""SELECT doc_id, ${h("en")} AS s_en, ${h("de")} AS s_de, ${h("es")} AS s_es,
           |CASE WHEN ${h("en")} >= ${h("de")} AND ${h("en")} >= ${h("es")} THEN 'en'
           |     WHEN ${h("de")} >= ${h("es")} THEN 'de' ELSE 'es' END AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin
      }
    ),
    // Corpus-relative rarity scoring: per doc, how many of its distinct
    // bigrams are hapax (appear in exactly one document) — the integer-exact
    // core of LM-style fluency/novelty scoring (no FP log-prob sums, which
    // would be merge-order-dependent). Bigrams build linearly via
    // posexplode + lead (see Dedup's PERF NOTE); corpus df is one hash agg
    // keyed on the bigram. Ratio is a single division — bit-stable (R7).
    GQ(
      "q_text_rarity",
      (s, d) => {
        val bgs = Grams.kgramRows(Tables.t(s, d, "documents"), 2, Seq())
          .drop("pos")
          .withColumnRenamed("item", "bg")
          .distinct()
        val dfs = bgs.groupBy(col("bg")).agg(count(lit(1)).as("df"))
        bgs.join(dfs, "bg")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_bigrams"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
          .withColumn("hapax_ratio",
            col("n_hapax").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws, text
             |           FROM documents),
             |b AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(ws) >= 2
             |        THEN list_transform(range(1, len(ws)),
             |             i -> ws[i] || ' ' || ws[i+1])
             |        ELSE [text] END) AS bg
             |      FROM w),
             |d AS (SELECT bg, COUNT(*) AS df FROM b GROUP BY bg)
             |SELECT b.doc_id, COUNT(*) AS n_bigrams,
             |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             |    AS hapax_ratio
             |FROM b JOIN d USING (bg)
             |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin)
    ),
    // Content fingerprint (md5 digest + 2-hex-char shard bucket): the
    // scale-out key for exact dedup — 100 TB dedup shuffles these 16-byte
    // digests, not document bodies.
    GQ(
      "q_text_fingerprint",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(
            col("doc_id"),
            md5(col("text").cast(BinaryType)).as("fp"),
            substring(md5(col("text").cast(BinaryType)), 1, 2).as("shard"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 2) AS shard
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // Word-distribution concentration (round 4, batch 10) — the Gini-
    // impurity complement Σ(c_w/n)² of a doc's unigram distribution: the
    // repeated-token concentration signal quality filters use beside
    // q_text_repetition's positional runs (a doc that says one word half
    // the time scores ~0.25+ however the repeats are arranged; entropy
    // would need the transcendental ln this surface bans, and Σp² ranks
    // the same pathology — the Simpson/Herfindahl index).
    //
    // Determinism: Σc² and n are exact BIGINTs (c ≤ doc length, Σc² <
    // 2^53 for any real document), conc = Σc²/n² is ONE IEEE division of
    // exactly-representable doubles (R7); ties → doc_id (R1).
    //
    // Plan shape (100 TB): explode → (doc_id, word) hash agg with
    // map-side combine (shuffle bounded by per-doc vocabulary, not
    // corpus), → doc_id agg, → TakeOrderedAndProject(20). No joins, no
    // windows, two narrow exchanges.
    GQ(
      "q_text_gini",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id"), col("word"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(col("c") * col("c")).as("sumsq"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"), col("sumsq"),
            (col("sumsq").cast(DoubleType) /
              (col("n_tokens") * col("n_tokens")).cast(DoubleType)).as("conc"))
          .orderBy(col("conc").desc, col("doc_id"))
          .limit(20),
      Some("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             |    FROM documents),
             |c AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2),
             |g AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |    COUNT(*) AS n_types, CAST(SUM(c * c) AS BIGINT) AS sumsq
             |  FROM c GROUP BY 1)
             |SELECT doc_id, n_tokens, n_types, sumsq,
             |  CAST(sumsq AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE)
             |    AS conc
             |FROM g ORDER BY conc DESC, doc_id LIMIT 20""".stripMargin)
    ),
    // Readability scoring (round 5) — Flesch–Kincaid grade per document,
    // the lightweight-quality-classifier signal beside q_text_quality's
    // ratio gates (pipelines bucket corpora by readability to balance
    // curricula). All inputs are exact integer counts — words (space
    // split), sentence marks ([.!?], floored at 1 so markless synthetic
    // docs stay defined), vowel-group syllable proxy ([aeiouy]+ runs of
    // the lowercased text, the standard heuristic) — and the grade is ONE
    // FIXED IEEE expression tree over those ints, written with identical
    // parenthesization in both engines (R7 discipline: determinism comes
    // from an identical operation sequence, not from avoiding FP).
    //
    // Plan shape (100 TB): three regexp/split counters inside the scan
    // projection, zero shuffles (the ORDER BY is presentation). The
    // regexes are RE2-simple (char classes + runs) — semantics identical
    // across Java and DuckDB regex engines.
    GQ(
      "q_text_readability",
      (s, d) =>
        Tables.t(s, d, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast(LongType).as("n_words"),
            greatest(lit(1L),
              regexp_count(col("text"), lit("[.!?]"))).as("n_sents"),
            regexp_count(lower(col("text")), lit("[aeiouy]+"))
              .cast(LongType).as("n_syll"))
          .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
            (lit(0.39) * (col("n_words").cast(DoubleType) /
                col("n_sents").cast(DoubleType))
              + lit(11.8) * (col("n_syll").cast(DoubleType) /
                col("n_words").cast(DoubleType))
              - lit(15.59)).as("fk_grade"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             |  GREATEST(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(
             |    text, '[.!?]')) AS BIGINT)) AS n_sents,
             |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |    AS BIGINT) AS n_syll,
             |  0.39 * (CAST(len(string_split(text, ' ')) AS DOUBLE) /
             |      CAST(GREATEST(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(
             |        text, '[.!?]')) AS BIGINT)) AS DOUBLE))
             |    + 11.8 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |        AS DOUBLE) /
             |      CAST(len(string_split(text, ' ')) AS DOUBLE))
             |    - 15.59 AS fk_grade
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    // RAKE keyword scores (round 5) — Rapid Automatic Keyword Extraction
    // (Rose et al. 2010), the unsupervised keyword pass run beside
    // q_text_tfidf's corpus-relative salience: split each doc into
    // candidate phrases at stopword boundaries, then score each word
    // degree/frequency, where degree(w) = Σ |phrase| over phrases
    // containing w (its within-phrase co-occurrence mass). Words living
    // in LONG content runs outrank equally-frequent words living alone —
    // the signal TF-IDF cannot see. Top-20 words.
    //
    // Determinism: phrase segmentation is exact integer arithmetic (the
    // phrase id is a running stopword count per doc); freq/degree are
    // BIGINTs; the score is ONE IEEE division of two exact ints (R7);
    // ties → (freq DESC, word) (R1).
    //
    // Plan shape (100 TB): positional explode → ONE doc-keyed window
    // (running stopword count; partitioned by doc, never global) → a
    // (doc, phrase)-keyed length agg joined back on the SAME key (no
    // second corpus partitioning) → vocab-bounded word agg → top-k
    // TakeOrderedAndProject. Two corpus-keyed exchanges total.
    GQ(
      "q_text_rake",
      (s, d) => {
        val stops = Seq("the", "a", "is", "of")
        val g = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .withColumn("st",
            when(col("w").isin(stops: _*), 1L).otherwise(0L))
          .withColumn("pid", sum(col("st")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        val content = g.filter(col("st") === 0)
        val ph = content.groupBy(col("doc_id"), col("pid"))
          .agg(count(lit(1)).as("plen"))
        content.join(ph, Seq("doc_id", "pid"))
          .groupBy(col("w").as("word"))
          .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
          .select(col("word"), col("freq"), col("degree"),
            (col("degree").cast(DoubleType) / col("freq").cast(DoubleType))
              .as("rake_score"))
          .orderBy(col("rake_score").desc, col("freq").desc, col("word"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT doc_id,
             |    unnest(list_transform(range(1, len(ws) + 1),
             |      i -> {'p': i, 'w': ws[i]})) AS s
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
             |        FROM documents)),
             |f AS (SELECT doc_id, s.p AS pos, s.w AS w,
             |    CASE WHEN s.w IN ('the', 'a', 'is', 'of') THEN 1 ELSE 0 END
             |      AS st FROM t),
             |g AS (SELECT *, SUM(st) OVER (PARTITION BY doc_id ORDER BY pos)
             |    AS pid FROM f),
             |ph AS (SELECT doc_id, pid, COUNT(*) AS plen FROM g
             |  WHERE st = 0 GROUP BY 1, 2)
             |SELECT g.w AS word, COUNT(*) AS freq,
             |  CAST(SUM(ph.plen) AS BIGINT) AS degree,
             |  CAST(SUM(ph.plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |    AS rake_score
             |FROM g JOIN ph ON ph.doc_id = g.doc_id AND ph.pid = g.pid
             |WHERE g.st = 0
             |GROUP BY g.w
             |ORDER BY rake_score DESC, freq DESC, word LIMIT 20""".stripMargin)
    ),
    // Word burstiness (round 5) — Church & Gale 1995's variance-to-mean
    // ratio over the docs CONTAINING each word: content words arrive in
    // bursts (a doc about sorting says "sort" many times; VMR ≫ 1) while
    // function words spread Poisson-like (VMR ≈ 1) — the
    // distribution-shape signal beside q_text_rarity's plain df and
    // q_text_tfidf's salience, and a topic-drift smell test (burstiness
    // collapsing corpus-wide means documents stopped being ABOUT things).
    // Per word: df (containing docs), cf (total count), and
    // VMR = population-variance/mean = (df·Σc² − cf²)/(df·cf); top-20
    // by VMR with a df ≥ 5 evidence floor.
    //
    // Determinism: all moments are exact BIGINTs; the numerator and
    // denominator widen to DECIMAL(38,0)/HUGEINT BEFORE multiplying
    // (R10 — cf² passes 2^63 past ~3·10⁹ occurrences), then ONE IEEE
    // division (R7, non-negative); ties → word (R1).
    //
    // Plan shape (100 TB): ONE corpus scan → (doc, word) hash agg
    // (map-side combine) → vocab-bounded word agg carrying three integer
    // moments; the VMR tree and top-k run on the vocab relation.
    GQ(
      "q_text_burstiness",
      (s, d) => {
        val wide = DecimalType(38, 0)
        val dc = Tables.t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        dc.groupBy(col("w").as("word"))
          .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
            sum(col("c") * col("c")).as("c2"))
          .filter(col("df") >= 5)
          .select(col("word"), col("df"), col("cf"),
            ((col("df").cast(wide) * col("c2") -
              col("cf").cast(wide) * col("cf")).cast(DoubleType) /
              (col("df").cast(wide) * col("cf")).cast(DoubleType))
              .as("vmr"))
          .orderBy(col("vmr").desc, col("word"))
          .limit(20)
      },
      Some("""WITH dc AS (SELECT doc_id, w, COUNT(*) AS c FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |    FROM documents) GROUP BY 1, 2),
             |m AS (SELECT w AS word, COUNT(*) AS df,
             |    CAST(SUM(c) AS BIGINT) AS cf,
             |    CAST(SUM(c * c) AS BIGINT) AS c2
             |  FROM dc GROUP BY 1 HAVING COUNT(*) >= 5)
             |SELECT word, df, cf,
             |  CAST(CAST(df AS HUGEINT) * c2 - CAST(cf AS HUGEINT) * cf
             |      AS DOUBLE)
             |    / CAST(CAST(df AS HUGEINT) * cf AS DOUBLE) AS vmr
             |FROM m ORDER BY vmr DESC, word LIMIT 20""".stripMargin)
    ),
    // Lexical-diversity profile per language (round 5) — the corpus-QA
    // triple: type-token ratio (vocabulary richness), hapax-legomena
    // rate (share of the vocabulary seen exactly once — organic text
    // runs 40-60%, template/synthetic corpora collapse toward zero; this
    // driver corpus reads ~0, the detector detecting), and the raw
    // counts behind both. Baayen 2001's first-order productivity stats,
    // the vocabulary-side complement of q_text_burstiness's
    // distribution shape and q_dq_entropy's concentration.
    //
    // Determinism: tokens/types/hapax are exact BIGINTs; TTR and the
    // hapax rate are each ONE IEEE division (R7, non-negative). ORDER BY
    // lang (R1).
    //
    // Plan shape (100 TB): ONE corpus scan → (lang, word) hash agg
    // (map-side combine; vocab-bounded output) → |langs|-row agg.
    // Nothing after the first agg exceeds the vocabulary.
    GQ(
      "q_text_lexdiv",
      (s, d) => {
        Tables.t(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("lang"))
          .agg(sum(col("c")).as("tokens"), count(lit(1)).as("types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
          .select(col("lang"), col("tokens"), col("types"), col("hapax"),
            (col("types").cast(DoubleType) / col("tokens").cast(DoubleType))
              .as("ttr"),
            (col("hapax").cast(DoubleType) / col("types").cast(DoubleType))
              .as("hapax_rate"))
          .orderBy(col("lang"))
      },
      Some("""WITH lw AS (SELECT lang, w, COUNT(*) AS c FROM (
             |    SELECT lang, unnest(string_split(text, ' ')) AS w
             |    FROM documents) GROUP BY 1, 2)
             |SELECT lang, CAST(SUM(c) AS BIGINT) AS tokens,
             |  COUNT(*) AS types,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS hapax,
             |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr,
             |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE) AS hapax_rate
             |FROM lw GROUP BY lang ORDER BY lang""".stripMargin)
    )
  )
}
