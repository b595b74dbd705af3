package graft.sources

import org.apache.spark.sql.types._

/** Pinned `StructType`s for the six reference tables and the raw API page
  * payloads (SURVEY.md §1.2) — never inferred: schema inference at 100 TB is
  * a full extra pass over the data (SURVEY.md §1.4).
  *
  * Output schemas carry the reference's *pre*-`astype(str)` types
  * (/root/reference/spotify-etl.py:76-84, :100-106, :121-127, :179-185,
  * :196-202); the all-TEXT erasure happens only at the sink
  * (`JdbcReplaceSink.castAllToString`, mirroring spotify-etl.py:211).
  */
object SpotifySchemas {

  // -- output (table) schemas -------------------------------------------

  val playlists: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("href", StringType),
    StructField("name", StringType),
    StructField("owner", StringType), // owner.display_name (spotify-etl.py:80)
    StructField("public", BooleanType),
    StructField("collaborative", BooleanType),
    StructField("tracks", IntegerType))) // tracks.total (spotify-etl.py:83)

  val playlistsTracks: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("artist", StringType), // artists[0].name (spotify-etl.py:103)
    StructField("album", StringType), // album.name (spotify-etl.py:104)
    StructField("playlist_id", StringType))) // injected key (spotify-etl.py:105)

  val savedTracks: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("added_at", TimestampType))) // ISO string (spotify-etl.py:126)

  val recentTracks: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("played_at", TimestampType))) // ISO string (spotify-etl.py:184)

  val followedArtists: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("genres", StringType), // ", ".join(genres) (spotify-etl.py:199)
    StructField("popularity", IntegerType),
    StructField("followers", IntegerType))) // followers.total (spotify-etl.py:201)

  /** Public Spotify audio-features object (spotify-etl.py:134-173 infers it
    * from the payload; we pin it — SURVEY.md §1.2 table `audio_features`). */
  val audioFeatures: StructType = StructType(Seq(
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("key", IntegerType),
    StructField("loudness", DoubleType),
    StructField("mode", IntegerType),
    StructField("speechiness", DoubleType),
    StructField("acousticness", DoubleType),
    StructField("instrumentalness", DoubleType),
    StructField("liveness", DoubleType),
    StructField("valence", DoubleType),
    StructField("tempo", DoubleType),
    StructField("type", StringType),
    StructField("id", StringType),
    StructField("uri", StringType),
    StructField("track_href", StringType),
    StructField("analysis_url", StringType),
    StructField("duration_ms", IntegerType),
    StructField("time_signature", IntegerType)))

  // -- raw page schemas (for from_json over fetched page bodies) --------

  private val trackObj = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("artists", ArrayType(StructType(Seq(StructField("name", StringType))))),
    StructField("album", StructType(Seq(StructField("name", StringType))))))

  /** GET /me/playlists page (spotify-etl.py:72-84). */
  val playlistsPage: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("href", StringType),
      StructField("name", StringType),
      StructField("owner", StructType(Seq(StructField("display_name", StringType)))),
      StructField("public", BooleanType),
      StructField("collaborative", BooleanType),
      StructField("tracks", StructType(Seq(StructField("total", IntegerType)))))))),
    StructField("next", StringType)))

  /** GET /playlists/{id}/tracks page — items[*].track may be null
    * (spotify-etl.py:95-106). */
  val playlistTracksPage: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("track", trackObj))))),
    StructField("next", StringType)))

  /** GET /me/tracks page (spotify-etl.py:113-127). */
  val savedTracksPage: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("added_at", StringType),
      StructField("track", trackObj))))),
    StructField("next", StringType)))

  /** GET /me/player/recently-played, single page (spotify-etl.py:175-185). */
  val recentTracksPage: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("played_at", StringType),
      StructField("track", trackObj)))))))

  /** GET /me/following?type=artist, single page (spotify-etl.py:192-202). */
  val followedArtistsPage: StructType = StructType(Seq(
    StructField("artists", StructType(Seq(
      StructField("items", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("genres", ArrayType(StringType)),
        StructField("popularity", IntegerType),
        StructField("followers", StructType(Seq(StructField("total", IntegerType)))))))))))))

  /** GET /audio-features?ids=… batch — entries may be null
    * (spotify-etl.py:151-167). */
  val audioFeaturesBatch: StructType = StructType(Seq(
    StructField("audio_features", ArrayType(audioFeatures))))
}
