package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP status callback (reference `shared_etls/etls/utils.py:14-27`:
  * POST `{id_request, process, value}` JSON to a status endpoint).
  * Failures are swallowed after logging — a status endpoint outage
  * must never fail an ingest job (same posture as the reference's
  * bare `requests.post`).
  */
final class HttpStatusReporter(endpoint: String, timeout: Duration = Duration.ofSeconds(10))
    extends StatusReporter {

  private lazy val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  def report(idRequest: String, process: String, value: String): Unit = {
    import graft.core.Json.{escape => esc}
    val body =
      s"""{"id_request": "${esc(idRequest)}", "process": "${esc(process)}", "value": "${esc(value)}"}"""
    try {
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(timeout)
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding())
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[status] POST $endpoint failed: ${e.getMessage}")
    }
  }
}
