package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.data.UrlOps

class UrlOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("url-ops-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def norm(urls: String*): Seq[String] = {
    val sp = spark; import sp.implicits._
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u"))).as[String].collect().toSeq
  }

  test("normalizeUrl pins every canonicalization rule") {
    val cases = Seq(
      // scheme+host lowercase, default https port, www, dup+trailing
      // slashes, tracking param first in query, fragment
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&id=7#sec" ->
        "https://example.com/a/b?id=7",
      // userinfo, http default port, trailing slash, 2nd-level suffix host
      "http://user@News.example.CO.UK:80/path/9/" ->
        "http://news.example.co.uk/path/9",
      // scheme-less input defaults to http; tracking param dropped mid-list
      "example.org/q?a=1&ref=tw&x=2" -> "http://example.org/q?a=1&x=2",
      // tracking-only query vanishes entirely
      "https://a.io/p?utm_campaign=c" -> "https://a.io/p",
      // non-default port survives; fragment-only tail drops
      "https://a.io:8443/p#x" -> "https://a.io:8443/p",
      // bare host, no path
      "HTTP://A.IO" -> "http://a.io",
      // root slash collapses to bare host (trailing-slash rule)
      "http://a.io/" -> "http://a.io",
      // 'href=' must NOT lose its tail to the 'ref' tracking rule
      "http://a.io/p?href=1&b=2" -> "http://a.io/p?href=1&b=2")
    assert(norm(cases.map(_._1): _*) == cases.map(_._2))
  }

  test("equivalent spellings normalize equal; distinct urls stay distinct") {
    val same = norm(
      "https://www.Example.com:443/x/?utm_source=a#f",
      "HTTPS://example.COM/x//",
      "https://example.com/x")
    assert(same.distinct.size == 1, same)
    val diff = norm("https://example.com/x", "https://example.com/y",
      "http://example.com/x", "https://example.com/x?q=1")
    assert(diff.distinct.size == 4, diff)
  }

  test("urlHost and registeredDomain") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "https://user@WWW.News.Example.co.uk:8080/p" ->
        ("news.example.co.uk", "example.co.uk"),
      "http://a.b.c.example.com/x" -> ("a.b.c.example.com", "example.com"),
      "example.org" -> ("example.org", "example.org"),
      "http://localhost:9000/x" -> ("localhost", "localhost"),
      // IP literals are their own registered domain, never "3.4"
      "http://10.2.3.4:8080/x" -> ("10.2.3.4", "10.2.3.4"),
      "http://[2001:db8::1]/x" -> ("[2001:db8::1]", "[2001:db8::1]"))
    val got = rows.map(_._1).toDF("u")
      .select(UrlOps.urlHost(col("u")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .as[(String, String)].collect().toSeq
    assert(got == rows.map(_._2))
  }

  test("fixed-point host rules: stacked www, ports, multi-@ userinfo") {
    assert(norm(
      "http://www.www.example.com/x",     // (www.)+ strips in ONE pass
      "http://a.io:80:80/x",              // (:80)+ strips in ONE pass
      "https://u@v@w.example.com/x") ==   // userinfo ends at the LAST @
      Seq("http://example.com/x", "http://a.io/x", "https://w.example.com/x"))
    // whitespace inside the authority must not defeat the anchored rules
    // (trim runs before AND after them — review-found counterexamples)
    assert(norm("http:// www.example.com/x", "http://a.io:80 /x") ==
      Seq("http://example.com/x", "http://a.io/x"))
  }

  test("normalizeUrl is idempotent over planted urls and url-ish fuzz") {
    val sp = spark; import sp.implicits._
    val alphabet = "abXY09.:/?&=#@_-%+ "
    def fuzz(seed: Long): String = {
      var h = graft.data.DedupHash.mix(seed)
      val n = 1 + (h & 31).toInt
      val b = new StringBuilder("http://")
      (0 until n).foreach { _ =>
        h = graft.data.DedupHash.mix(h)
        b += alphabet(((h >>> 8) % alphabet.length).toInt.abs)
      }
      if (seed % 3 == 0) b.toString.substring(7) else b.toString // 1/3 scheme-less
    }
    val inputs = (0L until 500L).map(fuzz) ++ Seq(
      "", "   ", "#", "?", "http://", "https://WWW.a.io:443//p//?utm_x=1#f")
    val once = inputs.toDF("u")
      .select(col("u"), UrlOps.normalizeUrl(col("u")).as("n1"))
      .select(col("u"), col("n1"), UrlOps.normalizeUrl(col("n1")).as("n2"))
      .as[(String, String, String)].collect()
    val broken = once.filter { case (_, n1, n2) => n1 != n2 }
    assert(broken.isEmpty, broken.take(5).mkString("; "))
  }

  test("null propagates through the whole chain") {
    val sp = spark; import sp.implicits._
    val out = Seq[Option[String]](None).toDF("u")
      .select(UrlOps.normalizeUrl(col("u")).as("n"),
        UrlOps.urlHost(col("u")).as("h"))
      .collect()(0)
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("dedupByUrl keeps the smallest id per normalized url") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (10L, "https://www.A.com/x/"),  // group 1
      (3L, "HTTP://a.com/x"),         // different scheme -> own group
      (7L, "https://a.com/x?utm_source=t"), // group 1 (tracking stripped)
      (5L, "https://a.com/x"),        // group 1
      (9L, "https://b.com/y")         // own group
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(docs)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(out == Set((5L, 3L), (3L, 1L), (9L, 1L)))
  }

  test("null urls are missing metadata, never duplicates of each other") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, null: String), (2L, null: String),
      (3L, "https://a.com/x")).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(docs)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L)), out)
  }

  test("domainMix counts docs and hosts per registered domain with ppm share") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "https://a.example.com/1"), (2L, "https://b.example.com/2"),
      (3L, "https://a.example.com/3"),
      (4L, "https://news.sample.co.uk/x")).toDF("doc_id", "url")
    val out = UrlOps.domainMix(docs)
      .select("domain", "n_docs", "n_hosts", "share_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("example.com", 3L, 2L, 750000L),
      ("sample.co.uk", 1L, 1L, 250000L)))
  }

  test("the whole surface is codegen projections + one exchange (no UDF)") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 100L).map(i => (i, s"https://h$i.example.com/p/$i"))
      .toDF("doc_id", "url")
    val plan = UrlOps.dedupByUrl(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
    assert(plan.contains("HashAggregate"), plan)
  }
}
