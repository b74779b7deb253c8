package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Smoke test for the driver-shell HTTP surface (`graft.Serve` mirrors
  * `app.py` + `text_processing.py:143-177`): liveness, a real /process
  * round-trip over the sample request, and the 500 error envelope. */
class ServeSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val http = HttpClient.newHttpClient()

  private def withShell[A](f: String => A): A = {
    val server = graft.Serve.startServer(TestSpark.session, 0)
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def get(url: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(url: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET / reports liveness like the reference root endpoint") {
    withShell { base =>
      val r = get(s"$base/")
      assert(r.statusCode() == 200)
      assert(mapper.readTree(r.body()).get("message").asText
        == "Text Processing Pipeline Demo API is running")
    }
  }

  test("POST /process runs the full pipeline and returns report rows") {
    withShell { base =>
      val r = post(s"$base/process", Pipeline.SampleRequest)
      assert(r.statusCode() == 200)
      val rows = mapper.readTree(r.body()).get("rows")
      assert(rows.size == 1)
      val report = rows.get(0).get("report").asText
      assert(report.contains("範例分類") && report.contains("本項無補充說明"))
    }
  }

  test("POST /process returns the 500 error envelope on a bad body") {
    withShell { base =>
      val r = post(s"$base/process", "this is not json")
      assert(r.statusCode() == 500)
      assert(mapper.readTree(r.body()).has("detail"))
    }
  }
}
