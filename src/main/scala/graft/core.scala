package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared engine query: a Spark plan builder plus (optionally) the
  * ANSI/DuckDB oracle SQL the driver hash-compares against (SURVEY.md §2.5/§2.6).
  * `oracle=None` ⇒ driver records a weaker rows-only check, so such queries
  * must always return >0 rows.
  */
final case class GQ(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None) {

  /** Build the plan, run the caller's action(s), then release exactly the
    * operator-internal persists THIS run created ([[Caches]] scope) — the
    * library-user entry point that cannot leak cached relations (round-3
    * ADVICE: `run` alone leaves any internal persist for the
    * ContextCleaner, which under memory pressure is non-deterministic).
    * Scoping matters (review r3): a session-global release would also drop
    * caches other components own — e.g. [[graft.sources.SpotifyPipeline]]'s
    * live-API extract caches, whose re-materialization re-fetches HTTP —
    * and would race a concurrent `GQ.apply` on the same session.
    *
    * The scope stops CAPTURING once `run` returns (round-4 ADVICE fix):
    * persists the caller's `f` makes — e.g. a pipeline run inside the
    * callback — belong to the caller (an enclosing scope or the session
    * registry), not to this query, so releasing here can no longer drop
    * them. Scopes also stack: a nested `GQ.apply` on the same thread
    * restores the outer scope when it closes instead of clobbering it.
    */
  def apply[A](spark: SparkSession, dir: String)(f: DataFrame => A): A = {
    val scope = Caches.beginScope()
    try {
      val df = try run(spark, dir) finally scope.close()
      f(df)
    } finally scope.release()
  }
}

/** Registry of operator-internal persists. Query plans that materialize an
  * intermediate (`Dedup.blockedJaccard`, `SpotifyPipeline`) route it through
  * [[Caches.persist]] instead of a bare `DataFrame.persist`, so release can
  * drop exactly the engine's own cached relations — and nothing the user
  * cached.
  *
  * Two tracking levels: while a [[beginScope]] is open on the current thread
  * (plan construction is synchronous, so `GQ.apply` sees every persist its
  * own run creates), persists land in that scope and die with it; otherwise
  * they land in the per-session registry drained by [[release]] — which
  * Bench/Verify call alongside `clearCache` so loops never accumulate
  * tracked plans (review r3).
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** A per-run collection of persists; release drops only its own.
    * Scopes STACK (round-4 ADVICE): `close()` restores the scope that was
    * active when this one opened, so a nested `beginScope` on the same
    * thread no longer leaks the outer scope's later persists into the
    * session registry. */
  final class Scope private[Caches] (prev: Scope) {
    private[Caches] val dfs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    /** Stop capturing on this thread (restores the enclosing scope) WITHOUT
      * dropping what was already captured. Idempotent; a no-op if another
      * scope has since taken over. */
    def close(): Unit =
      if (current.get() eq this) {
        if (prev != null) current.set(prev) else current.remove()
      }

    def release(): Unit = {
      close()
      import scala.jdk.CollectionConverters._
      dfs.asScala.foreach(_.unpersist(blocking = false))
      dfs.clear()
    }
  }

  private val current = new ThreadLocal[Scope]

  /** Open a scope on this thread: persists until `close()`/`release()`
    * belong to it. */
  def beginScope(): Scope = {
    val s = new Scope(current.get())
    current.set(s)
    s
  }

  /** `persist(MEMORY_AND_DISK)` + track — in the current thread's open
    * [[Scope]] if one exists, else in the session registry.
    *
    * IDEMPOTENT per plan (round 12, VERDICT item 6): two operators built in
    * one session may route the SAME sub-plan through persist (observed:
    * q_stats_ks and q_stats_mannwhitney share the counts agg — building
    * both plans logged `Asked to cache already cached data`). Spark's
    * CacheManager would WARN and keep the first entry, so the second call
    * is skipped outright — and deliberately NOT tracked: the cache has
    * exactly one owner (the first caller's scope/registry entry), whose
    * release drops the one entry; a later re-run simply re-persists. */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) return df
    val scope = current.get()
    if (scope != null) scope.dfs.add(df)
    else tracked.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every session-registry plan of this session (async — executors
    * drop blocks in the background) and drop the registry entry. Safe at any
    * time: re-running a query simply re-persists on first use. */
  def release(spark: SparkSession): Unit = {
    val q = tracked.remove(spark)
    if (q != null) {
      import scala.jdk.CollectionConverters._
      q.asScala.foreach(_.unpersist(blocking = false))
    }
  }
}

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` — schema comes from the parquet
  * footer (pinned by the driver, never inferred from data), so Catalyst gets
  * full pushdown/pruning. The single exception is `events`, whose `ts` column
  * the engine normalizes to LongType epoch-nanoseconds (SURVEY.md §2.5 R5)
  * whatever the parquet physical type. All time math on events is exact
  * integer math over those nanos.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet: epoch-nanos `ts` shim, kept in exactly one place.
    *
    * The driver's generator has shipped `ts` as parquet TIMESTAMP(NANOS)
    * (rounds 1–3) and as TIMESTAMP(MICROS) (round 4+); test fixtures plant
    * it as a raw BIGINT. All three surface here as the SAME LongType
    * epoch-nanos column, so every downstream query keeps one time basis:
    *   - BIGINT          → already nanos, pass through;
    *   - TIMESTAMP(NANOS)→ `spark.sql.legacy.parquet.nanosAsLong=true`
    *     (Spark 4.1.2 otherwise refuses nanos parquet) reads it as nanos;
    *   - TIMESTAMP[_NTZ] → `unix_micros(ts) * 1000` — exact integer widen,
    *     no precision games. NTZ first re-tags as UTC instant via the
    *     session clock; every entry point (Verify/Bench/tests) pins
    *     `spark.sql.session.timeZone=UTC`, matching DuckDB's oracle-side
    *     `epoch_ns(ts)` on the same file.
    *
    * CAVEAT (round-2 ADVICE): the legacy flag is SESSION-scoped — Spark has
    * no per-read option for it — so it leaks into every later read on this
    * session, surfacing any other nanos-timestamp parquet as LongType too.
    * Acceptable for this harness (every events consumer wants exactly that);
    * a user-facing API would isolate the flag in a dedicated session via
    * `spark.newSession()` before setting it. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => // TIMESTAMP or TIMESTAMP_NTZ (micros): widen to nanos
        raw.withColumn("ts",
          (unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
            .cast(LongType))
    }
  }
}

/** Cross-engine 60-bit hash basis (round 2, VERDICT item 2): the first 15
  * hex digits of md5 parsed as a BIGINT. md5 over UTF-8 bytes is
  * bit-identical in Spark and DuckDB, so every sketch built on this basis
  * (MinHash signatures, LSH band keys, SimHash bits, winnowing fingerprints)
  * is hash-comparable against a DuckDB oracle — the round-1 `xxhash64` basis
  * forced those queries onto the weaker rows-only check, where a flipped
  * sign bit or wrong band key would pass undetected.
  *
  * The Spark expression and the DuckDB SQL fragment live side by side so
  * they drift together or not at all (same pattern as [[C.sqlRevenue]]).
  * 15 hex digits = 60 bits, always positive, exact in BIGINT in both
  * engines (and below 2^62 after the MinHash affine step).
  */
object XHash {
  import org.apache.spark.sql.functions.{conv, md5, substring}

  /** Spark side: `h60(c)` over the UTF-8 bytes of `c`'s string form.
    * Round 13: routed through the native [[graft.functions.Md5Prefix60]]
    * kernel — same MD5 digest, top 60 bits read straight from the digest
    * bytes instead of the hex-encode → substring → `conv` re-parse the
    * column formula paid per row on the per-shingle hot path.
    * [[h60Legacy]] keeps the original formula for the equivalence spec. */
  def h60(c: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.Registry.registerOnce(s, "graft_h60")(h60Expr _ compose (_.head))
        org.apache.spark.sql.functions.call_function("graft_h60", c)
      case None => h60Legacy(c) // plan built off-session: keep the slow-but-equal form
    }

  /** The round-1..12 column formula, retained as the spec's ground truth
    * (XHashEquivalenceSpec pins h60 ≡ h60Legacy on edge-case strings). */
  private[graft] def h60Legacy(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

  /** DuckDB side: identical value for the same string expression. */
  def sqlH60(x: String): String =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  /** Raw-Expression form for [[graft.GraftExtensions]]' SQL `h60(expr)`. */
  def h60Expr(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    graft.functions.Md5Prefix60(Cast(e, BinaryType))
  }
}

/** Determinism-contract helpers (SURVEY.md §2.5).
  *
  * R2: money math is done on DECIMAL(18,2) (products: scale 4) — exact and
  * aggregation-order-independent in both Spark and DuckDB — then the final
  * aggregate is cast to DOUBLE for a stable output representation.
  */
object C {
  val Dec2: DecimalType = DecimalType(18, 2)

  /** Exact 2-dp decimal view of a double column carrying ≤2 decimals. */
  def dec2(c: Column): Column = c.cast(Dec2)

  /** SUM over exact decimals, emitted as DOUBLE (R2). */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** extendedprice * (1 - discount) in exact decimal (scale 4). */
  def revenue(price: Column, disc: Column): Column =
    dec2(price) * (lit(1).cast(Dec2) - dec2(disc))

  /** SUM of revenue, emitted as DOUBLE (R2). */
  def sumRevenue(price: Column, disc: Column): Column =
    sum(revenue(price, disc)).cast(DoubleType)

  /** Matching DuckDB oracle fragments — keep the SQL text next to the Spark
    * expression so they drift together or not at all. */
  val sqlRevenue: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
  def sqlSumDec2(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** 1-based rank over a BOUNDED (top-k / model-sized) relation via a
    * strict-predecessor-count self-join — the window-free replacement for
    * `row_number() OVER (ORDER BY ...)` with no PARTITION BY, which moves
    * its whole input to one partition (round 6: the registry-wide plan pin
    * bans unpartitioned windows outright). `order` lists (column,
    * descending?) lexicographically; the composite order MUST be total
    * (append a unique key), so the result is bit-identical to the global
    * row_number. Cost is |df|² pairs — only ever call this on a relation
    * already bounded by a LIMIT or a fixed domain. Persist `df` first if
    * its lineage is corpus-sized (both join sides consume it).
    *
    * Predecessors count a non-null MARKER literal added to the join side
    * (round-7 ADVICE): counting `y.<last-order-col>` would conflate a NULL
    * in a genuinely-matched row with the left-outer no-predecessor case
    * and silently under-rank when an order column is nullable.
    */
  def rankBounded(df: DataFrame, rankName: String,
      order: (String, Boolean)*): DataFrame = {
    def before(ix: Int): Column = {
      val (c, desc) = order(ix)
      val strict =
        if (desc) col(s"y.$c") > col(s"x.$c") else col(s"y.$c") < col(s"x.$c")
      if (ix == order.size - 1) strict
      else strict || (col(s"y.$c") === col(s"x.$c") && before(ix + 1))
    }
    df.as("x")
      .join(df.withColumn("__rb_marker", lit(1)).as("y"), before(0), "left_outer")
      .groupBy(df.columns.toSeq.map(c => col(s"x.$c")): _*)
      .agg((count(col("y.__rb_marker")) + 1)
        .cast(LongType).as(rankName))
  }
}
