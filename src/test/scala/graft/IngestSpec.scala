package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

class IngestSpec extends SparkSpec {

  private def fixtures(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("ingest")
    java.nio.file.Files.write(dir.resolve("page_one.html"),
      "<html><body>alpha beta</body></html>".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("page_two.html"),
      "<html><body>gamma</body></html>".getBytes("UTF-8"))
    (s"file://$dir/page_one.html", s"file://$dir/page_two.html")
  }

  test("fetchUrls: file:// fixtures fetch ok, bytes intact, manifest columns ride through") {
    val s = spark
    import s.implicits._
    val (u1, u2) = fixtures()
    val manifest = Seq((1L, u1), (2L, u2)).toDF("req_id", "url")
    val out = Ingest.fetchUrls(spark, manifest).orderBy("req_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("status") == "ok"))
    assert(out.forall(_.getAs[Int]("attempts") == 1))
    assert(out.forall(r => r.getAs[String]("error") == null))
    val body = new String(out(0).getAs[Array[Byte]]("content"), "UTF-8")
    assert(body == "<html><body>alpha beta</body></html>")
    assert(out(0).getAs[Long]("n_bytes") == body.length)
    assert(out(0).getAs[Long]("req_id") == 1L) // passthrough column intact
  }

  test("fetchUrls: a dead URL becomes an error ROW after maxAttempts, never an exception") {
    val s = spark
    import s.implicits._
    val (u1, _) = fixtures()
    val dead = "file:///nonexistent/graft/no_such_page.html"
    val manifest = Seq((1L, u1), (2L, dead)).toDF("req_id", "url")
    val out = Ingest.fetchUrls(spark, manifest, maxAttempts = 3,
        retryBackoffMs = 1).orderBy("req_id").collect()
    val err = out(1)
    assert(err.getAs[String]("status") == "error")
    assert(err.getAs[Int]("attempts") == 3) // retried to the bound
    assert(err.getAs[String]("error") != null)
    assert(err.getAs[Array[Byte]]("content") == null)
    // the healthy row is unaffected by its partition-mate's failure
    assert(out(0).getAs[String]("status") == "ok")
  }

  test("fetchUrls: max_bytes caps a pathological response as an error row") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ingest")
    java.nio.file.Files.write(dir.resolve("big.html"),
      Array.fill[Byte](4096)('x'.toByte))
    val manifest = Seq(s"file://$dir/big.html").toDF("url")
    val out = Ingest.fetchUrls(spark, manifest, maxBytes = 1024).collect()(0)
    assert(out.getAs[String]("status") == "error")
    assert(out.getAs[String]("error").contains("max_bytes"))
  }

  test("artifactFilename + hostOf: the reference's cache-filename convention") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "https://ex.com/reviews/page",   // path -> underscores + .html
      "https://ex.com/deep/a/b.html",  // keeps existing .html
      "https://ex.com/",               // empty path -> host with dots -> _
      "https://x.co").toDF("url")
    val out = df.select(
      Ingest.artifactFilename(col("url")).as("f"),
      Ingest.hostOf(col("url")).as("h")).collect()
    assert(out(0).getString(0) == "reviews_page.html")
    assert(out(1).getString(0) == "deep_a_b.html")
    assert(out(2).getString(0) == "ex_com.html")
    assert(out(3).getString(0) == "x_co.html")
    assert(out(0).getString(1) == "ex.com")
    assert(out(3).getString(1) == "x.co")
  }

  private def demoDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("dispatch")
    java.nio.file.Files.write(dir.resolve("older_page.html"),
      "<html><body>old</body></html>".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("demo_newest.html"),
      "<html><body>new</body></html>".getBytes("UTF-8"))
    // make mtimes unambiguous: newest strictly later
    java.nio.file.Files.setLastModifiedTime(dir.resolve("older_page.html"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(dir.resolve("demo_newest.html"),
      java.nio.file.attribute.FileTime.fromMillis(2000000000000L))
    dir.toString
  }

  test("searchDispatch demo: one resolved row, the NEWEST fixture (S3 mtime order)") {
    val out = Ingest.searchDispatch(spark, "demo", fixturesDir = demoDir()).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("method") == "demo")
    assert(r.getAs[String]("url").endsWith("demo_newest.html"))
    assert(r.getAs[Boolean]("resolved"))
    assert(r.getAs[String]("requested") == null && r.getAs[String]("note") == null)
  }

  test("searchDispatch keywords: placeholder fallback to demo, input preserved, note set") {
    val out = Ingest.searchDispatch(spark, "keywords",
      Some("tokyo restaurant reviews"), fixturesDir = demoDir()).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("requested") == "tokyo restaurant reviews")
    assert(r.getAs[String]("url").endsWith("demo_newest.html"))
    assert(!r.getAs[Boolean]("resolved"))
    assert(r.getAs[String]("note").contains("placeholder"))
  }

  test("searchDispatch urls: reference parity falls back to demo; resolveUrls splits the list") {
    val input = "https://ex.com/a\nhttps://ex.com/b, https://ex.com/c\n\n"
    val parity = Ingest.searchDispatch(spark, "urls", Some(input),
      fixturesDir = demoDir()).collect()
    assert(parity.length == 1 && !parity(0).getAs[Boolean]("resolved"))
    val resolved = Ingest.searchDispatch(spark, "urls", Some(input),
      resolveUrls = true).orderBy("url").collect()
    assert(resolved.map(_.getAs[String]("url")).toSeq ==
      Seq("https://ex.com/a", "https://ex.com/b", "https://ex.com/c"))
    assert(resolved.forall(_.getAs[Boolean]("resolved")))
    assert(resolved.forall(_.getAs[String]("requested") == input.trim))
  }

  test("searchDispatch: missing input and unknown methods throw (reference ValueError parity)") {
    intercept[IllegalArgumentException] {
      Ingest.searchDispatch(spark, "keywords", None, fixturesDir = demoDir())
    }
    intercept[IllegalArgumentException] {
      Ingest.searchDispatch(spark, "urls", Some("   "), fixturesDir = demoDir())
    }
    intercept[IllegalArgumentException] {
      Ingest.searchDispatch(spark, "browse", Some("x"), fixturesDir = demoDir())
    }
  }

  test("writeFilePerRow + fetchUrls: the materialize->fetch loop round-trips bytes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    val df = Seq(("a.html", "alpha <b>beta</b>"), ("b.html", "gamma")).toDF("name", "content")
    val n = Ingest.writeFilePerRow(df, dir)
    assert(n == 2L)
    val manifest = Seq(s"file://$dir/a.html", s"file://$dir/b.html").toDF("url")
    val out = Ingest.fetchUrls(spark, manifest).orderBy("url").collect()
    assert(new String(out(0).getAs[Array[Byte]]("content"), "UTF-8") == "alpha <b>beta</b>")
    assert(new String(out(1).getAs[Array[Byte]]("content"), "UTF-8") == "gamma")
  }

  test("canonicalUrl: each rule on a hand-written case, plus the no-op identity") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // scheme+host case, default http port, fragment
      ("HTTP://WWW.Ex.COM:80/Path#sec", "http://www.ex.com/Path"),
      // https default port dropped, non-default kept
      ("https://ex.com:443/a", "https://ex.com/a"),
      ("https://ex.com:8443/a", "https://ex.com:8443/a"),
      // tracking params out, survivors sorted, empty query dropped
      ("http://ex.com/p?utm_source=x&b=2&a=1", "http://ex.com/p?a=1&b=2"),
      ("http://ex.com/p?utm_campaign=x&gclid=1&fbclid=2&ref=h", "http://ex.com/p"),
      // trailing slashes collapse; root and empty path stay "/"
      ("http://ex.com/a/b//", "http://ex.com/a/b"),
      ("http://ex.com/", "http://ex.com/"),
      ("http://ex.com", "http://ex.com/"),
      // already-canonical input is a fixpoint
      ("http://ex.com:8080/a?a=1&b=2", "http://ex.com:8080/a?a=1&b=2"))
    val got = cases.map(_._1).toDF("url")
      .select(Ingest.canonicalUrl(col("url")).as("c")).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in)") }
    // canonicalization is idempotent on every case above
    val again = cases.map(_._2).toDF("url")
      .select(Ingest.canonicalUrl(col("url")).as("c")).as[String].collect()
    assert(again.toSeq == cases.map(_._2))
  }

  test("fetchUrls: per-task rate limiter spaces requests by min_interval_ms") {
    val s = spark
    import s.implicits._
    val (u1, u2) = fixtures()
    // one partition, two URLs, 200 ms interval -> wall >= ~200 ms
    val manifest = Seq(u1, u2).toDF("url").coalesce(1)
    val t0 = System.nanoTime()
    val out = Ingest.fetchUrls(spark, manifest, minIntervalMs = 200).collect()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(out.forall(_.getAs[String]("status") == "ok"))
    assert(wallMs >= 180, s"rate limiter did not space requests (wall ${wallMs}ms)")
  }
}
