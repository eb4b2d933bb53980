package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** Opt-in live-HTTP smoke for [[graft.sources.Ingest.fetchUrls]] (r11
  * VERDICT task 5): the correctness catalog drives the fetch stack over
  * `file://` fixtures only, so the HTTP-specific behaviors — timeout,
  * redirect-following, non-200 handling, politeness pacing, the
  * max-bytes cap — were untested. This suite exercises them against a
  * LOCAL ephemeral `com.sun.net.httpserver` (loopback only, never the
  * network; ref fallback semantics: `download_page_fun.py:35-124`).
  *
  * Skipped by default (`assume` cancels) because the round driver's
  * environment is zero-egress and port-binding policies vary; enable
  * with `GRAFT_HTTP_SMOKE=1 sbt "testOnly graft.IngestHttpSpec"`. */
object IngestHttpSpec {
  // request-arrival log for the politeness test: tasks run in this JVM
  // under local mode, so a shared queue observes the worker's requests
  val arrivals = new ConcurrentLinkedQueue[Long]()
}

class IngestHttpSpec extends SparkSpec {

  private val enabled = sys.env.get("GRAFT_HTTP_SMOKE").contains("1")
  private def gate(): Unit =
    assume(enabled, "live-HTTP smoke is opt-in: set GRAFT_HTTP_SMOKE=1")

  private def withServer(test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) =>
      respond(ex, 200, "<html>hello</html>".getBytes("UTF-8")))
    server.createContext("/redirect", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Location",
        s"http://127.0.0.1:${server.getAddress.getPort}/ok")
      respond(ex, 302, Array.emptyByteArray)
    })
    server.createContext("/missing", (ex: HttpExchange) =>
      respond(ex, 404, "gone".getBytes("UTF-8")))
    server.createContext("/boom", (ex: HttpExchange) =>
      respond(ex, 500, "err".getBytes("UTF-8")))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(500)
      respond(ex, 200, "late".getBytes("UTF-8"))
    })
    server.createContext("/big", (ex: HttpExchange) =>
      respond(ex, 200, Array.fill[Byte](256 * 1024)('x')))
    server.createContext("/paced", (ex: HttpExchange) => {
      IngestHttpSpec.arrivals.add(System.nanoTime())
      respond(ex, 200, "ok".getBytes("UTF-8"))
    })
    server.setExecutor(null)
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def fetch(urls: Seq[String], maxAttempts: Int = 3,
                    minIntervalMs: Long = 0L, timeoutMs: Int = 5000,
                    maxBytes: Long = 10L * 1024 * 1024) = {
    val s = spark
    import s.implicits._
    sources.Ingest.fetchUrls(s,
        urls.toDF("url").coalesce(1), // one task: sequential worker
        maxAttempts = maxAttempts, minIntervalMs = minIntervalMs,
        retryBackoffMs = 10L, timeoutMs = timeoutMs, maxBytes = maxBytes)
      .select("url", "status", "content", "attempts", "error")
      .collect()
      .map(r => r.getString(0) -> (r.getString(1),
        Option(r.get(2)).map(_ => new String(r.getAs[Array[Byte]](2), "UTF-8")),
        r.getInt(3), Option(r.getString(4))))
      .toMap
  }

  test("HTTP: 200 succeeds first try, 302 is followed, 404/500 become error rows") {
    gate()
    withServer { base =>
      val out = fetch(Seq(s"$base/ok", s"$base/redirect", s"$base/missing", s"$base/boom"))
      val (okSt, okBody, okAtt, _) = out(s"$base/ok")
      assert(okSt == "ok" && okBody.contains("<html>hello</html>") && okAtt == 1)
      // redirect: java.net follows the 302 transparently; body is /ok's
      val (rSt, rBody, _, _) = out(s"$base/redirect")
      assert(rSt == "ok" && rBody.contains("<html>hello</html>"))
      // non-200: an error COLUMN, never an exception; all attempts spent
      for (u <- Seq(s"$base/missing", s"$base/boom")) {
        val (st, body, att, err) = out(u)
        assert(st == "error" && body.isEmpty && att == 3 && err.nonEmpty)
      }
    }
  }

  test("HTTP: read timeout surfaces as an error row after bounded retries") {
    gate()
    withServer { base =>
      val (st, _, att, err) = fetch(Seq(s"$base/slow"),
        maxAttempts = 2, timeoutMs = 100)(s"$base/slow")
      assert(st == "error" && att == 2)
      assert(err.exists(_.contains("SocketTimeoutException")))
    }
  }

  test("HTTP: max_bytes caps a pathological response") {
    gate()
    withServer { base =>
      val (st, _, _, err) = fetch(Seq(s"$base/big"),
        maxBytes = 1024L)(s"$base/big")
      assert(st == "error" && err.exists(_.contains("max_bytes")))
    }
  }

  test("HTTP: politeness pacing spaces same-task requests by min_interval_ms") {
    gate()
    withServer { base =>
      IngestHttpSpec.arrivals.clear()
      fetch(Seq(s"$base/paced", s"$base/paced?i=2", s"$base/paced?i=3"),
        minIntervalMs = 250L)
      val ts = IngestHttpSpec.arrivals.toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).sorted
      assert(ts.length == 3)
      val gapsMs = ts.sliding(2).map { case Array(a, b) => (b - a) / 1e6 }.toSeq
      // scheduling slack: assert >= 80% of the configured interval
      assert(gapsMs.forall(_ >= 200.0), s"gaps were $gapsMs ms")
    }
  }
}
