package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The reference deployment contract (credentials.py:3-10): same variable
  * names in, wired connector out — with the failure modes the reference
  * lacks (loud missing-variable errors, partial-DB-quad detection).
  */
class SpotifyEnvConfigSpec extends AnyFunSuite {

  private val full = Map(
    "SPOTIFY_CLIENT_ID" -> "cid", "SPOTIFY_CLIENT_SECRET" -> "sec",
    "SPOTIFY_REFRESH_TOKEN" -> "rt",
    "DB_USER" -> "u", "DB_PASSWORD" -> "pw",
    "DB_HOST" -> "db.example.test", "DB_PORT" -> "26257")

  test("reads the reference's variable names; assembles the reference's JDBC URL") {
    val cfg = SpotifyEnvConfig.fromEnv(full)
    assert(cfg.clientId === "cid" && cfg.clientSecret === "sec" &&
      cfg.refreshToken === "rt")
    // spotify-etl.py:26's postgresql://u:pw@host:port/defaultdb?sslmode=require
    // — credentials travel as connection PROPERTIES, not URL params, so a
    // password containing '&'/'=' can't break the URL and Spark's JDBC
    // password redaction still applies (round-7 ADVICE)
    assert(cfg.jdbcUrl === Some(
      "jdbc:postgresql://db.example.test:26257/defaultdb?sslmode=require"))
    assert(cfg.jdbcProperties === Map("user" -> "u", "password" -> "pw"))
  }

  test("credentials with URL metacharacters survive as properties verbatim") {
    val cfg = SpotifyEnvConfig.fromEnv(full + ("DB_PASSWORD" -> "p&w=%2 0"))
    assert(cfg.jdbcUrl.get.endsWith("/defaultdb?sslmode=require"))
    assert(cfg.jdbcProperties("password") === "p&w=%2 0")
  }

  test("a missing SPOTIFY_* variable fails loudly, naming the variable") {
    val e = intercept[IllegalArgumentException] {
      SpotifyEnvConfig.fromEnv(full - "SPOTIFY_REFRESH_TOKEN")
    }
    assert(e.getMessage.contains("SPOTIFY_REFRESH_TOKEN"))
  }

  test("extract-only deployment: no DB variables means no URL, not an error") {
    val cfg = SpotifyEnvConfig.fromEnv(
      full -- Seq("DB_USER", "DB_PASSWORD", "DB_HOST", "DB_PORT"))
    assert(cfg.jdbcUrl === None)
  }

  test("a partial DB quad names the missing variables") {
    val cfg = SpotifyEnvConfig.fromEnv(full - "DB_PORT")
    val e = intercept[IllegalArgumentException](cfg.jdbcUrl)
    assert(e.getMessage.contains("DB_PORT"))
  }

  test("the wired source carries OAuth + pacing: a token is minted and attached") {
    // transport stub: answers the token endpoint and records the bearer
    // header of the one API call. The holder is a STATIC object — the GET
    // runs inside a task, so a closure-captured var would only mutate the
    // task's deserialized copy (same trap FakeHttp solves).
    EnvConfigProbe.seenAuth.set(null)
    val src = SpotifyEnvConfig.fromEnv(full).source(EnvConfigProbe)
    val spark = graft.TestSpark.spark
    assert(src.playlists(spark).count() === 0)
    assert(Option(EnvConfigProbe.seenAuth.get()) === Some("Bearer at-1"),
      "the API call must carry the refreshed bearer token")
  }
}

/** Static transport probe: answers the token endpoint, records the bearer
  * header of API GETs in a JVM-wide atomic (visible across task closures in
  * local mode). */
object EnvConfigProbe extends HttpClient {
  val seenAuth = new java.util.concurrent.atomic.AtomicReference[String]()
  override def get(url: String, headers: Map[String, String]): HttpResponse = {
    headers.get("Authorization").foreach(seenAuth.set)
    HttpResponse(200, """{"items": [], "next": null}""")
  }
  override def post(url: String, headers: Map[String, String], body: String): HttpResponse =
    HttpResponse(200, """{"access_token": "at-1", "expires_in": 3600}""")
}
