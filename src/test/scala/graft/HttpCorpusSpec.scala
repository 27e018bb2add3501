package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HttpCorpus, RumorPagesSource, RumorSource}

/** HttpCorpus against a local stub origin (zero egress): verifies the
  * reference's fetch contract — Basic auth header, UA/accept-language,
  * redirect-follow, URL templating with encodeURIComponent, permissive
  * error semantics, HEAD-based existence probes — per
  * /root/reference/netlify/functions/fetchRumors.js:14-30,52-56,131.
  */
class HttpCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var origin: String = _
  private val bodyGets = new AtomicInteger(0)
  @volatile private var lastHeaders: Map[String, String] = Map.empty

  private val page1 = "<html><body><main><p>page one</p></main></body></html>"
  private val page2 = "<html><body><main><p>page two</p></main></body></html>"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def serve(ex: HttpExchange, code: Int, body: String): Unit = {
      lastHeaders = Map(
        "authorization" -> ex.getRequestHeaders.getFirst("Authorization"),
        "user-agent" -> ex.getRequestHeaders.getFirst("User-agent"),
        "accept-language" -> ex.getRequestHeaders.getFirst("Accept-language")
      ).collect { case (k, v) if v != null => (k, v) }
      val bytes = body.getBytes("UTF-8")
      if (ex.getRequestMethod == "HEAD") {
        ex.sendResponseHeaders(code, -1)
      } else {
        if (code == 200) bodyGets.incrementAndGet()
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      }
      ex.close()
    }
    server.createContext("/", (ex: HttpExchange) => {
      ex.getRequestURI.getPath match {
        case "/rumors/tag/big_apple_team/" => serve(ex, 200, page1)
        case "/rumors/tag/big_apple_team/page/2/" => serve(ex, 200, page2)
        // redirect target + a 302 source (reference follows redirects)
        case "/rumors/tag/moved/" =>
          ex.getResponseHeaders.add("Location", s"$origin/rumors/tag/big_apple_team/")
          ex.sendResponseHeaders(302, -1); ex.close()
        case _ => serve(ex, 404, "")
      }
    })
    server.start()
    origin = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("fetch sends the reference's headers (auth from pair, UA, accept-language)") {
    val c = new HttpCorpus(origin, Some("u:p"))
    assert(c.fetch("big_apple_team", 1).contains(page1))
    assert(lastHeaders("authorization") ==
      "Basic " + java.util.Base64.getEncoder.encodeToString("u:p".getBytes))
    assert(lastHeaders("user-agent") == HttpCorpus.UserAgent)
    assert(lastHeaders("accept-language") == "en-US,en;q=0.9")
  }

  test("no auth header when PREVIEW_BASIC_AUTH is unset") {
    val c = new HttpCorpus(origin, None)
    assert(c.fetch("big_apple_team", 1).contains(page1))
    assert(!lastHeaders.contains("authorization"))
  }

  test("page>1 urls use the page/{n}/ template; slug is uri-encoded") {
    val c = new HttpCorpus(origin, None)
    assert(c.fetch("big_apple_team", 2).contains(page2))
    // an encodable slug resolves to an encoded path (404 here, but the
    // request must not throw from URI construction)
    assert(c.fetch("équipe d'élite", 1).isEmpty)
    assert(RumorSource.encodeUriComponent("équipe d'élite") == "%C3%A9quipe%20d'%C3%A9lite")
  }

  test("non-2xx and missing pages are permissive fetch failures (None)") {
    val c = new HttpCorpus(origin, None)
    assert(c.fetch("big_apple_team", 3).isEmpty)
    assert(c.fetch("no_such_tag", 1).isEmpty)
    // connection failure is also None, not a throw
    assert(new HttpCorpus("http://127.0.0.1:1", None).fetch("x", 1).isEmpty)
  }

  test("redirects are followed (reference: redirect: follow)") {
    val c = new HttpCorpus(origin, None)
    assert(c.fetch("moved", 1).contains(page1))
  }

  test("exists() probes via HEAD — no body GETs at planning time") {
    val c = new HttpCorpus(origin, None)
    bodyGets.set(0)
    assert(c.exists("big_apple_team", 1))
    assert(c.exists("big_apple_team", 2))
    assert(!c.exists("big_apple_team", 3))
    assert(bodyGets.get() == 0, "existence probes must not fetch bodies")
  }

  test("end-to-end: DSv2 scan + pipeline over the http scheme") {
    val spark = Engine.session(master = "local[4]")
    val rows = RumorSource.elementRows(spark, origin, Seq("big_apple_team"))
    assert(rows.count() == 2) // one <p> element row per page
    assert(RumorPagesSource.providerFromSpec(origin).isInstanceOf[HttpCorpus])
  }
}
