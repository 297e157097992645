package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.control.NonFatal

/** S1/S3/S4 — the production [[Sources.Fetcher]]: `java.net.http` GET with
  * the reference's network contract:
  *
  *   - per-call timeout (60 s for CSV/odds endpoints — utils.py:6,
  *     fetch_the_odds_api.py:53,67; 30 s for the FBR xG API —
  *     fetch_fbr_team_xg.py:19) via the `timeoutSec` parameter;
  *   - non-200 → None (fetch_the_odds_api.py:66-69 prints and returns
  *     None); any connect/read failure → None. Callers degrade to the
  *     empty-but-valid frame (S6) and the DAG completes, exit 0.
  *   - sequential rate-limit pacing: `minIntervalMs` blocks each call
  *     until that much time has passed since the PREVIOUS request from
  *     this client — the FBR ~1-request-per-3.2 s contract
  *     (fetch_fbr_team_xg.py:86-88). The fetcher is driver-side by
  *     design (fetched bodies enter Spark via createDataset), so the
  *     limit is honored globally, never multiplied across executors.
  *
  * One instance per API client, mirroring the reference's per-script
  * session; `get` is synchronized so concurrent driver threads can't
  * interleave inside the pacing window.
  */
final class HttpFetcher(minIntervalMs: Long = 0L) extends Sources.Fetcher {

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private var lastRequestAtNs: Long = 0L // monotonic; 0 = no request yet

  override def get(url: String, headers: Map[String, String] = Map.empty,
                   timeoutSec: Int = 60): Option[String] = synchronized {
    if (lastRequestAtNs != 0L && minIntervalMs > 0L) {
      val waitMs =
        minIntervalMs - (System.nanoTime() - lastRequestAtNs) / 1000000L
      if (waitMs > 0L) Thread.sleep(waitMs)
    }
    try {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSec.toLong))
        .GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200) Some(resp.body()) else None
    } catch {
      case NonFatal(_) => None
    } finally {
      // pace from request COMPLETION, like the reference's post-call sleep
      lastRequestAtNs = System.nanoTime()
    }
  }
}
