package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Live HTTP tag-page origin — the reference's fetch contract
  * (/root/reference/netlify/functions/fetchRumors.js:14-30,52-56):
  *
  *  - Basic `authorization` header from the `PREVIEW_BASIC_AUTH` env var
  *    ("user:pass", base64'd like the reference's `getAuthHeader`,
  *    fetchRumors.js:17-20). The reference hardcodes a fallback pair in
  *    source; that default is deliberately NOT reproduced here —
  *    credentials belong in the environment, so unset means no auth
  *    header.
  *  - Browser `user-agent` + `accept-language` headers (fetchRumors.js:22-28).
  *  - Redirect-follow (fetchRumors.js:29 `redirect: "follow"`).
  *  - URL templating `{origin}/rumors/tag/{encodeURIComponent(slug)}/
  *    [page/{n}/]` (fetchRumors.js:131) via [[RumorSource.crawlUrl]]'s
  *    path shape.
  *  - Any non-2xx or transport error is a fetch failure → `None`, which
  *    ends that tag's pagination with prior pages kept (the reference's
  *    permissive semantics, fetchRumors.js:133-137).
  *
  * The planning-time probe is a HEAD request (existence only — the page
  * body is fetched exactly once, by the executor's reader); origins that
  * reject HEAD (405/501) fall back to a ranged GET.
  *
  * Spec usage: `"http://origin[:port]"` / `"https://origin"` resolve
  * here through the RumorPagesSource scheme registry.
  */
final class HttpCorpus(origin: String, authPair: Option[String])
    extends RumorSource.PageProvider {

  def this(origin: String) = this(origin, sys.env.get("PREVIEW_BASIC_AUTH"))

  // HttpClient is not serializable; rebuilt lazily in each JVM the
  // provider lands in (driver for probes, executors for reads)
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private def builder(slug: String, page: Int): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(
      URI.create(origin + RumorSource.crawlPath(slug, page)))
      .timeout(Duration.ofSeconds(30))
      .header("user-agent", HttpCorpus.UserAgent)
      .header("accept-language", "en-US,en;q=0.9")
    authPair.fold(b)(p => b.header("authorization",
      "Basic " + Base64.getEncoder.encodeToString(p.getBytes(StandardCharsets.UTF_8))))
  }

  override def fetch(slug: String, page: Int): Option[String] =
    try {
      val res = client.send(builder(slug, page).GET().build(),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      if (res.statusCode() >= 200 && res.statusCode() < 300) Some(res.body())
      else None
    } catch { case _: Exception => None }

  override def exists(slug: String, page: Int): Boolean =
    try {
      val res = client.send(
        builder(slug, page).method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.discarding())
      val sc = res.statusCode()
      if (sc == 405 || sc == 501) {
        // origin rejects HEAD: probe with a single-byte ranged GET and
        // discard the body (206 = range honored). CAVEAT: an origin that
        // ALSO ignores Range returns 200 with the full body, which the
        // discarding handler drops client-side but which still crosses
        // the wire — the "never a full download at planning time"
        // guarantee holds only for HEAD- or range-honoring origins
        // (the request's 30 s timeout bounds the worst case). Note also
        // that handle(debug=true) runs its own existence sweep on top of
        // the planning probe — one extra HEAD per (slug, page) on debug
        // requests only.
        val r = client.send(
          builder(slug, page).header("range", "bytes=0-0").GET().build(),
          HttpResponse.BodyHandlers.discarding())
        r.statusCode() >= 200 && r.statusCode() < 300
      } else sc >= 200 && sc < 300
    } catch { case _: Exception => false }
}

object HttpCorpus {
  /** The reference's UA string, fetchRumors.js:24-25. */
  val UserAgent: String =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120 Safari/537.36"
}
