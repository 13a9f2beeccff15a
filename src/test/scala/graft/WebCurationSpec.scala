package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, WebCuration}

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(WebCuration.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: hand-checked forms") {
    val cases = Seq(
      // case folding + www + default port + fragment + tracking params +
      // param sort + trailing slash, all at once
      "HTTPS://WWW.News.Example.COM:443/A/b/?utm_source=x&b=2&a=1#top" ->
        "https://news.example.com/A/b?a=1&b=2",
      // http default port dropped; non-default kept
      "http://example.com:80/x" -> "http://example.com/x",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      // :443 is NOT http's default — kept
      "http://example.com:443/x" -> "http://example.com:443/x",
      // all params tracking → no '?'; root path collapses
      "https://example.com/?utm_campaign=a&fbclid=z&gclid=q&ref=hp" ->
        "https://example.com",
      // path case preserved (paths are case-sensitive), query keeps values
      "https://a.example.org/Docs/Q?id=7" -> "https://a.example.org/Docs/Q?id=7",
      // bare host, nothing to do
      "https://example.com" -> "https://example.com")
    assert(canon(cases.map(_._1): _*) === cases.map(_._2))
  }

  test("canonicalizeUrl is idempotent on the fixture corpus") {
    val d = Tables.documentsWithUrls(spark, sfDir)
      .select(WebCuration.canonicalizeUrl(col("url")).as("c1"))
      .select(col("c1"), WebCuration.canonicalizeUrl(col("c1")).as("c2"))
    assert(d.filter(col("c1") =!= col("c2")).count() === 0)
  }

  test("registeredDomain: two-label, multi-part suffix, dotless host") {
    val cases = Seq(
      "news.example.com" -> "example.com",
      "a.b.example.co.uk" -> "example.co.uk",
      "example.co.uk" -> "example.co.uk",
      "deep.sub.shop.example.com.au" -> "example.com.au",
      "example.org" -> "example.org",
      "localhost" -> "localhost")
    val got = cases.map(_._1).toDF("h")
      .select(WebCuration.registeredDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("capPerGroup keeps at most cap rows, best rank first, id tie-break") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.7),
      ("b", 5L, 0.1)).toDF("g", "id", "r")
    val got = WebCuration.capPerGroup(df, "g", col("r"), "id", 2)
      .select("g", "id").as[(String, Long)].collect().toSet
    // a: 0.9-pair wins (tie → ids 1,2); b: its only row
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 5L)))
  }

  test("alias URLs (host case + fragment) collapse onto one canonical key") {
    val base = Tables.documentsWithUrls(spark, sfDir)
    val ali = base.withColumn("url", concat(
      replace(col("url"), lit(".Example."), lit(".EXAMPLE.")), lit("#Alias")))
    val a = base.select(WebCuration.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    val b = ali.select(WebCuration.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    assert(a.toSeq === b.toSeq)
    // and distinct docs do NOT collide (doc_id is in the path)
    assert(a.distinct.length === a.length)
  }

  test("pageRank matches the hand-run integer-grid recursion on a 3-node graph") {
    // A→B(2), B→A(1), C→A(1), C→B(1) — C is a pure source, never ranked up
    val edges = Seq(("a", "b", 2L), ("b", "a", 1L), ("c", "a", 1L),
      ("c", "b", 1L)).toDF("src", "dst", "wt")
    def handRound(r: Map[String, Long]): Map[String, Long] = {
      // contributions quantized exactly as the operator spells them
      def c(rq: Long, wt: Long, deg: Long): Long =
        math.floor(rq.toDouble * wt / deg + 0.5).toLong
      val inA = r.get("b").map(c(_, 1, 1)).toSeq ++ r.get("c").map(c(_, 1, 2))
      val inB = r.get("a").map(c(_, 2, 2)).toSeq ++ r.get("c").map(c(_, 1, 2))
      Map(
        "a" -> (150000000L + math.floor(0.85 * inA.sum + 0.5).toLong),
        "b" -> (150000000L + math.floor(0.85 * inB.sum + 0.5).toLong))
    }
    var hand = Map("a" -> 1000000000L, "b" -> 1000000000L, "c" -> 1000000000L)
    for (_ <- 1 to 3) hand = handRound(hand)
    val got = WebCuration.pageRank(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === hand.filter { case (k, _) => k != "c" })
  }

  test("registeredDomainPsl: longest match, self-suffix, fallback, LITE divergence") {
    val psl = WebCuration.publicSuffixes.toDF("suffix")
    val hosts = Seq(
      "alice.github.io",      // multi-level private suffix → 3 labels kept
      "deep.sub.alice.github.io", // registered domain unchanged by subdomains
      "example.com",          // plain TLD → 2 labels
      "a.b.example.co.uk",    // 2-part public suffix → example.co.uk
      "github.io",            // host IS a suffix → itself
      "site.unknowntld",      // no suffix match → LITE fallback (2 labels)
      "localhost"             // dotless → LITE fallback (itself)
    ).toDF("host")
    val got = WebCuration.registeredDomainPsl(hosts, "host", psl)
      .as[(String, String)].collect().toMap
    assert(got("alice.github.io") === "alice.github.io")
    assert(got("deep.sub.alice.github.io") === "alice.github.io")
    assert(got("example.com") === "example.com")
    assert(got("a.b.example.co.uk") === "example.co.uk")
    assert(got("github.io") === "github.io")
    assert(got("site.unknowntld") === "site.unknowntld")
    assert(got("localhost") === "localhost")
    // the case the LITE regex rule gets WRONG: multi-level private suffix
    assert(got("alice.github.io") !== "github.io")
  }

  test("cutContaminatedSpans cuts exactly the planted benchmark span") {
    val filler = (0 until 40).map(i => s"w$i")
    val leak = (0 until 12).map(i => s"q$i")  // 12 tokens ≥ minLen 10
    val contaminated =
      (filler.take(20) ++ leak ++ filler.drop(20)).mkString(" ")
    val cleanDoc = filler.mkString(" ")
    val docs = Seq((1L, contaminated), (2L, cleanDoc)).toDF("doc_id", "text")
    val bench = Seq((100L, leak.mkString(" "))).toDF("bench_id", "text")
    val got = Dedup.cutContaminatedSpans(docs, bench)
      .as[(Long, String)].collect().toMap
    assert(got(1L) === cleanDoc)       // leak excised, filler reassembled
    assert(got(2L) === cleanDoc)       // untouched doc passes verbatim
  }

  test("cutContaminatedSpans: sub-minLen overlap is not cut; bench empty → identity") {
    val doc = ((0 until 15).map(i => s"w$i") ++ (0 until 9).map(i => s"q$i"))
      .mkString(" ")  // 9-token overlap < minLen 10
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val bench9 = Seq((100L, (0 until 9).map(i => s"q$i").mkString(" ")))
      .toDF("bench_id", "text")
    val got9 = Dedup.cutContaminatedSpans(docs, bench9)
      .as[(Long, String)].collect().toMap
    assert(got9(1L) === doc)
    val benchEmpty = Seq.empty[(Long, String)].toDF("bench_id", "text")
    val got0 = Dedup.cutContaminatedSpans(docs, benchEmpty)
      .as[(Long, String)].collect().toMap
    assert(got0(1L) === doc)
  }

  test("htmlExtract: blocks, bait rejection, entity decode, whitespace") {
    val html =
      "<html><head><title>T</title><style>p{x:1}</style>" +
        "<script>if (1<2) { s(\"&amp;\"); }</script></head><body>" +
        "<!-- <p>ghost</p> -->" +
        "<h1>A  Title</h1><p>one &amp; two &lt;three&gt;</p>" +
        "<div>block&nbsp;2</div>" +
        "<p>double &amp;amp; escape</p></body></html>"
    val got = WebCuration.htmlExtract(Seq((7L, html)).toDF("doc_id", "html"))
      .orderBy("block_no")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (7L, 1L, "A Title"),               // whitespace collapsed
      (7L, 2L, "one & two <three>"),     // entities decoded
      (7L, 3L, "block 2"),               // &nbsp; → space
      (7L, 4L, "double &amp; escape")))  // &amp; decoded LAST: no double decode
    // none of the bait surfaced: no script/style/comment/head content
    assert(!got.exists(_._3.contains("ghost")))
    assert(!got.exists(_._3.contains("track")) && !got.exists(_._3.contains("x:1")))
  }

  test("htmlExtract over the fixture law: full text recovered as the main block") {
    val d = Tables.documents(spark, sfDir)
    val pages = d.select(col("doc_id"),
      WebCuration.htmlFromLaw(col("doc_id"), col("text")).as("html"))
    val blocks = WebCuration.htmlExtract(pages)
    // 5 blocks per page: nav, h1, p (the document text), div, footer
    assert(blocks.count() === d.count() * 5)
    val p = blocks.filter(col("block_no") === 3)
      .select(col("doc_id"), col("block_text"))
    val orig = d.select(col("doc_id"),
      trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
    assert(p.join(orig, "doc_id")
      .filter(col("block_text") =!= col("t")).count() === 0)
  }
}
