package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpFetcher

/** Production Fetcher against a local JDK HttpServer: body round-trip,
  * non-200 → None (S6 degradation input), read-timeout → None, and the
  * sequential rate-limit pacing contract (fetch_fbr_team_xg.py:86-88).
  * No Spark session needed — the fetcher is pure driver-side I/O.
  */
class HttpFetcherSpec extends AnyFunSuite {

  private def withServer(routes: (String, HttpExchange => Unit)*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        try handler(ex) finally ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  test("200 returns the body; request headers pass through") {
    withServer(
      "/csv" -> (ex => respond(ex, 200, "Date,HomeTeam\n01/01/2025,X")),
      "/auth" -> (ex => respond(ex, 200,
        Option(ex.getRequestHeaders.getFirst("X-API-Key")).getOrElse("missing")))
    ) { base =>
      val f = new HttpFetcher()
      assert(f.get(s"$base/csv").contains("Date,HomeTeam\n01/01/2025,X"))
      assert(f.get(s"$base/auth", Map("X-API-Key" -> "k123")).contains("k123"))
    }
  }

  test("non-200 → None (caller degrades to empty-valid frame, S6)") {
    withServer("/gone" -> (ex => respond(ex, 404, "not here"))) { base =>
      assert(new HttpFetcher().get(s"$base/gone").isEmpty)
    }
  }

  test("unreachable host and read-timeout both → None, within the budget") {
    // connection refused: nothing listens on the ephemeral port we closed
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val deadPort = srv.getAddress.getPort
    srv.start(); srv.stop(0)
    assert(new HttpFetcher().get(s"http://127.0.0.1:$deadPort/x").isEmpty)

    withServer("/slow" -> (ex => { Thread.sleep(5000); respond(ex, 200, "late") })) {
      base =>
        val t0 = System.nanoTime()
        val out = new HttpFetcher().get(s"$base/slow", timeoutSec = 1)
        val elapsedMs = (System.nanoTime() - t0) / 1000000L
        assert(out.isEmpty)
        assert(elapsedMs >= 1000L && elapsedMs < 4000L,
          s"timeout not enforced: ${elapsedMs}ms")
    }
  }

  test("rate limit: consecutive gets paced by minIntervalMs, first is free") {
    withServer("/ok" -> (ex => respond(ex, 200, "b"))) { base =>
      val f = new HttpFetcher(minIntervalMs = 400L)
      val t0 = System.nanoTime()
      assert(f.get(s"$base/ok").contains("b")) // no pre-wait on first call
      val afterFirstMs = (System.nanoTime() - t0) / 1000000L
      assert(afterFirstMs < 300L, s"first call was paced: ${afterFirstMs}ms")
      assert(f.get(s"$base/ok").contains("b"))
      assert(f.get(s"$base/ok").contains("b"))
      val totalMs = (System.nanoTime() - t0) / 1000000L
      assert(totalMs >= 800L, s"two paced gaps expected: ${totalMs}ms")
    }
  }

  test("failed request still advances the pacing clock") {
    withServer("/gone" -> (ex => respond(ex, 500, "err"))) { base =>
      val f = new HttpFetcher(minIntervalMs = 300L)
      assert(f.get(s"$base/gone").isEmpty)
      val t0 = System.nanoTime()
      assert(f.get(s"$base/gone").isEmpty)
      assert((System.nanoTime() - t0) / 1000000L >= 250L)
    }
  }
}
