package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** S1 OAuth coverage (stub-driven, like SpotifySourceSpec): refresh-token
  * exchange wire format, expiry-driven re-refresh under a fake clock, error
  * propagation, the 401 → refresh → retry path through [[OAuthClient]], and
  * the one-shot authorization-code bootstrap — the flows the reference
  * implements at /root/reference/spotify-etl.py:29-42 and
  * /root/reference/generate_token.py:8-15.
  */
class TokenProviderSpec extends AnyFunSuite {

  private final class PostRecorder(
      respond: Int => HttpResponse) extends HttpClient {
    val posts = ArrayBuffer.empty[(String, Map[String, String], String)]
    override def get(url: String, headers: Map[String, String]): HttpResponse =
      HttpResponse(500, "GET not expected here")
    override def post(url: String, headers: Map[String, String], body: String): HttpResponse = {
      posts += ((url, headers, body))
      respond(posts.size)
    }
  }

  private def tokenJson(token: String, expiresInSec: Long): HttpResponse =
    HttpResponse(200, s"""{"access_token": "$token", "token_type": "Bearer",
      |"expires_in": $expiresInSec, "scope": "user-top-read"}""".stripMargin)

  test("refresh POSTs grant_type=refresh_token under Basic auth and caches the token") {
    val http = new PostRecorder(n => tokenJson(s"tok$n", 3600))
    val tp = new TokenProvider(http, "cid", "secret", "rt-1", nowMs = () => 0L)
    assert(tp.authHeaders === Map("Authorization" -> "Bearer tok1"))
    // cached: no second POST while the token is fresh
    assert(tp.accessToken === "tok1")
    assert(http.posts.size === 1)
    val (url, headers, body) = http.posts.head
    assert(url === "https://accounts.spotify.com/api/token")
    val expectedBasic = "Basic " + Base64.getEncoder.encodeToString(
      "cid:secret".getBytes(StandardCharsets.UTF_8))
    assert(headers("Authorization") === expectedBasic)
    assert(headers("Content-Type") === "application/x-www-form-urlencoded")
    assert(body === "grant_type=refresh_token&refresh_token=rt-1")
  }

  test("expiry (minus slack) drives re-refresh; a fresh token is re-cached") {
    var now = 0L
    val http = new PostRecorder(n => tokenJson(s"tok$n", 3600))
    val tp = new TokenProvider(http, "cid", "secret", "rt",
      expirySlackSec = 60, nowMs = () => now)
    assert(tp.accessToken === "tok1")
    now = 3539L * 1000 // just inside 3600-60s
    assert(tp.accessToken === "tok1")
    now = 3540L * 1000 // deadline reached
    assert(tp.accessToken === "tok2")
    assert(http.posts.size === 2)
    now = 3541L * 1000 // new token freshly cached
    assert(tp.accessToken === "tok2")
    assert(http.posts.size === 2)
  }

  test("non-2xx refresh fails loudly instead of returning a broken header") {
    val http = new PostRecorder(_ => HttpResponse(400, """{"error":"invalid_grant"}"""))
    val tp = new TokenProvider(http, "cid", "secret", "rt-revoked")
    val e = intercept[IllegalArgumentException](tp.accessToken)
    assert(e.getMessage.contains("400"))
  }

  test("OAuthClient injects Bearer and retries exactly once on 401") {
    val seen = ArrayBuffer.empty[(String, Map[String, String])]
    var posts = 0
    val http = new HttpClient {
      override def get(url: String, headers: Map[String, String]): HttpResponse = {
        seen += ((url, headers))
        // first access token is rejected (revoked early); the refreshed one works
        if (headers("Authorization") == "Bearer tok1") HttpResponse(401, "expired")
        else HttpResponse(200, """{"ok": true}""")
      }
      override def post(url: String, headers: Map[String, String], body: String): HttpResponse = {
        posts += 1
        tokenJson(s"tok$posts", 3600)
      }
    }
    val tp = new TokenProvider(http, "cid", "secret", "rt", nowMs = () => 0L)
    val client = new OAuthClient(http, tp)
    val r = client.get("https://api.spotify.com/v1/me/playlists", Map("X-Extra" -> "1"))
    assert(r.status === 200)
    assert(posts === 2, "401 must trigger one token refresh")
    assert(seen.map(_._2("Authorization")) === Seq("Bearer tok1", "Bearer tok2"))
    assert(seen.forall(_._2("X-Extra") == "1"), "caller headers must be preserved")
    // subsequent calls reuse the refreshed token with no extra exchange
    assert(client.get("u2", Map.empty).status === 200)
    assert(posts === 2)
  }

  test("OAuthClient decorates POST too, but passes the token endpoint through") {
    val apiPosts = ArrayBuffer.empty[(String, Map[String, String], String)]
    var refreshes = 0
    val http = new HttpClient {
      override def get(url: String, headers: Map[String, String]): HttpResponse =
        HttpResponse(500, "GET not expected here")
      override def post(url: String, headers: Map[String, String], body: String): HttpResponse =
        if (url == "https://accounts.spotify.com/api/token") {
          refreshes += 1
          tokenJson(s"tok$refreshes", 3600)
        } else {
          apiPosts += ((url, headers, body))
          if (headers("Authorization") == "Bearer tok1") HttpResponse(401, "expired")
          else HttpResponse(201, """{"snapshot_id": "s1"}""")
        }
    }
    val tp = new TokenProvider(http, "cid", "secret", "rt", nowMs = () => 0L)
    val client = new OAuthClient(http, tp)
    // API POST: Bearer-injected, one 401 retry with a refreshed token
    val r = client.post("https://api.spotify.com/v1/playlists/p1/tracks",
      Map("Content-Type" -> "application/json"), """{"uris": []}""")
    assert(r.status === 201)
    assert(refreshes === 2, "401 on POST must trigger one token refresh")
    assert(apiPosts.map(_._2("Authorization")) === Seq("Bearer tok1", "Bearer tok2"))
    assert(apiPosts.forall(_._3 == """{"uris": []}"""), "body must be resent unchanged")
    // token endpoint itself: untouched (Basic auth survives, no recursion)
    val direct = client.post("https://accounts.spotify.com/api/token",
      Map("Authorization" -> "Basic xyz"), "grant_type=refresh_token&refresh_token=rt")
    assert(direct.status === 200)
  }

  test("authorization-code bootstrap returns the initial refresh token") {
    val http = new PostRecorder(_ => HttpResponse(200,
      """{"access_token": "a1", "refresh_token": "r1", "expires_in": 3600}"""))
    val (access, refresh) = TokenProvider.exchangeAuthorizationCode(
      http, "cid", "secret", code = "auth-code", redirectUri = "http://localhost:3000/")
    assert((access, refresh) === (("a1", "r1")))
    val (_, _, body) = http.posts.head
    // parameter values are form-encoded: a redirect URI's own ':'/'/' (or a
    // query string) must not leak into the form structure
    assert(body ===
      "grant_type=authorization_code&code=auth-code" +
        "&redirect_uri=http%3A%2F%2Flocalhost%3A3000%2F")
  }

  test("form values with reserved characters are percent-encoded") {
    val http = new PostRecorder(n => tokenJson(s"tok$n", 3600))
    val tp = new TokenProvider(http, "cid", "secret", "r+t/x&y=z", nowMs = () => 0L)
    tp.accessToken
    val (_, _, body) = http.posts.head
    assert(body === "grant_type=refresh_token&refresh_token=r%2Bt%2Fx%26y%3Dz")
  }

  test("RateLimitedClient paces and retries POST like GET (shared 429 path)") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val flaky = new HttpClient {
      override def get(url: String, headers: Map[String, String]): HttpResponse =
        HttpResponse(200, "ok")
      override def post(url: String, headers: Map[String, String], body: String): HttpResponse = {
        calls += 1
        if (calls == 1) HttpResponse(429, "slow down", Map("Retry-After" -> "2"))
        else HttpResponse(200, "ok")
      }
    }
    val limited = new RateLimitedClient(flaky, minIntervalMs = 0, sleeper = sleeps += _)
    val r = limited.post("u", Map.empty, "b")
    assert(r.status === 200)
    assert(calls === 2)
    assert(sleeps.contains(2000L), "Retry-After must be honored for POST")
  }
}
