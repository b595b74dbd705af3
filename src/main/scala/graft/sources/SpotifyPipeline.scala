package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `main()` DAG (spotify-etl.py:217-289) as lazy DataFrame
  * composition. Stages:
  *
  *  1. independent extracts — playlists, recent, followed (reference
  *     gathers them concurrently, :230-234; here they are independent lazy
  *     plans whose jobs the sink actions launch);
  *  2. data-dependent fan-out — playlist ids feed the per-playlist tracks
  *     fetch (:238-243). The reference pulls ids to a driver list; at scale
  *     the id set stays a Dataset and the fetch runs in `mapPartitions`
  *     (SURVEY.md §7.5 / P8);
  *  3. union + DISTINCT of track ids so no audio-features batch is fetched
  *     twice — the reference's one explicit semantic optimization
  *     (:247-251, C2) — then the ≤100-id batched lookup (:253);
  *  4. staging (ingest_date + all-string cast) and six replace-mode loads
  *     (:264-280).
  *
  * `run` returns the six staged frames keyed by their reference table names
  * (:272-279) so callers (tests, or a real JDBC deployment) own the final
  * write action.
  */
final class SpotifyPipeline(source: SpotifySource) {

  def run(spark: SparkSession, ingestTs: Timestamp): Map[String, DataFrame] = {
    import spark.implicits._

    // stage 1: independent extracts. Extracts feeding MORE THAN ONE output
    // lineage (playlists → its own table + the tracks fan-out + audio ids;
    // playlistTracks/saved → their tables + audio ids) are persisted via the
    // tracked cache (graft.Caches): a lazy paginated extract re-runs its
    // live HTTP pagination on EVERY action (SpotifySource re-fetch
    // semantics), so without the persist, writing the six tables would
    // re-paginate playlists three times. One fetch populates the cache; the
    // caller releases with Caches.release(spark) after its write actions.
    val playlists = graft.Caches.persist(source.playlists(spark))
    val recent = source.recentTracks(spark)
    val followed = source.followedArtists(spark)

    // stage 2: data-dependent fan-out (ids stay distributed)
    val playlistIds = playlists.select(col("id")).as[String]
    val playlistTracks = graft.Caches.persist(source.playlistTracks(spark, playlistIds))

    // stage 3: saved tracks, then union-distinct of ids -> batched lookup
    val saved = graft.Caches.persist(source.savedTracks(spark))
    val trackIds = playlistTracks.select(col("id"))
      .union(saved.select(col("id"))) // C2 (spotify-etl.py:250)
      .filter(col("id").isNotNull) // null-id filter (spotify-etl.py:251)
      .distinct()
      .as[String]
    val audio = source.audioFeatures(spark, trackIds)

    // stage 4: staging; the caller runs the JdbcReplaceSink.write actions
    Map(
      "playlists" -> playlists,
      "playlists_tracks" -> playlistTracks,
      "saved_tracks" -> saved,
      "recent_tracks" -> recent,
      "followed_artists" -> followed,
      "audio_features" -> audio
    ).map { case (name, df) => name -> JdbcReplaceSink.stage(df, ingestTs) }
  }

  /** Concurrent-orchestration parity with the reference's `asyncio.gather`
    * (spotify-etl.py:230-234): the write actions of INDEPENDENT extracts
    * are submitted from parallel threads so Spark's scheduler overlaps
    * their jobs (and their HTTP pagination), while data-dependent stages
    * wait for exactly the extracts they consume:
    *
    *   wave 1 — playlists, saved, recent, followed (mutually independent;
    *            the reference gathers its three — saved joins the wave here
    *            because it, too, depends on nothing);
    *   wave 2 — playlists_tracks (the fan-out reads wave 1's playlists
    *            cache; racing it into wave 1 would re-paginate the
    *            playlists extract concurrently — the cache populates
    *            during, not before, the first action that touches it);
    *   wave 3 — audio_features (reads the playlist-tracks AND saved
    *            caches via the union-distinct id set).
    *
    * `write` owns the terminal action per table (a JDBC write, a parquet
    * sink, a test collector). Any wave member's failure propagates after
    * its wave completes submitting — no table is silently skipped. Returns
    * the staged frames, like [[run]]. */
  def runConcurrent(
      spark: SparkSession,
      ingestTs: Timestamp,
      write: (String, DataFrame) => Unit): Map[String, DataFrame] = {
    val staged = run(spark, ingestTs)
    val waves = Seq(
      Seq("playlists", "saved_tracks", "recent_tracks", "followed_artists"),
      Seq("playlists_tracks"),
      Seq("audio_features"))
    for (wave <- waves) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(wave.size)
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val done = wave.map(name =>
          name -> scala.concurrent.Future(write(name, staged(name)))(ec))
        // Await EVERY wave member before propagating (round-7 ADVICE): a
        // sequential await-and-throw would abandon still-running sibling
        // writes un-observed and swallow their failures. Here each outcome
        // is captured as a Try; the first failure propagates with the rest
        // attached as suppressed, so no table's result goes unreported.
        val outcomes = done.map { case (name, f) =>
          name -> scala.util.Try(scala.concurrent.Await.result(
            f, scala.concurrent.duration.Duration.Inf))
        }
        val failures = outcomes.collect {
          case (name, scala.util.Failure(e)) => (name, e)
        }
        failures.headOption.foreach { case (_, first) =>
          failures.tail.foreach { case (_, e) => first.addSuppressed(e) }
          throw first
        }
      } finally pool.shutdown()
    }
    staged
  }
}
