package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-provenance curation — the URL/domain half of a crawl pipeline
  * (RefinedWeb/C4 practice) that the text operators don't cover: a crawl
  * frontier emits the same page under many URL spellings, and a handful of
  * template-heavy domains can dominate a naively-sampled corpus.
  *
  * Everything here is per-row string surgery (codegen'd regex/array
  * expressions — one linear pass, no shuffle) or a keyed window bounded to
  * ≤ cap rows per group through the shuffle, so the family is
  * 100 TB-indifferent by construction. All spellings are pinned so the
  * DuckDB twins replay them exactly (no java.net.URI — its parsing rules
  * are JVM-specific and un-oracle-able).
  */
object WebCuration {

  /** Query parameters dropped by [[canonicalizeUrl]]: click-tracking keys
    * that vary per share/session without changing the page. Pinned list —
    * part of the canonicalization contract, mirrored in the SQL twins.
    */
  val trackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

  /** Canonical URL form — the dedup key for "same page, many spellings":
    *
    *   1. fragment dropped (`#...` never reaches the server);
    *   2. scheme and host lowercased (RFC 3986 §6.2.2.1 case rules);
    *   3. leading `www.` stripped;
    *   4. default ports dropped (`:80` on http, `:443` on https); any
    *      other explicit port is load-bearing and kept;
    *   5. trailing slashes stripped from the path (`/a/` ≡ `/a`; the root
    *      path collapses to no path);
    *   6. query: tracking params ([[trackingParamRe]]) and empty fragments
    *      removed, survivors sorted bytewise (order never reaches the
    *      server), `?` dropped when nothing survives.
    *
    * One compound codegen'd expression per row — no UDF, no driver work.
    * Expects `scheme://hostport[/path][?query][#frag]` shapes (a crawl
    * pipeline's input contract); anything else passes through the same
    * regex surgery deterministically.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val qstr = regexp_extract(noFrag, "\\?(.*)$", 1)
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val after = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(after, "^([^/]*)", 1))
    val rawPath = regexp_replace(after, "^[^/]*", "")
    val host = regexp_replace(regexp_replace(hostport, ":[0-9]+$", ""),
      "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(rawPath, "/+$", "")
    val params = array_sort(filter(split(qstr, "&"),
      p => p =!= "" && !p.rlike(trackingParamRe)))
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Registered domain of a CANONICAL host (the per-site grouping key):
    * the last two labels, or three when the two-label tail is a pinned
    * multi-part public suffix (`co.uk com.au co.jp com.br co.in`).
    * Public-suffix-LITE by declaration: the real PSL is a 10k-line moving
    * list; this pins the rule so both engines compute the same key, and a
    * production deployment swaps in a broadcast PSL table join without
    * touching callers.
    */
  def registeredDomain(host: Column): Column = {
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(two === "", host)  // dotless host (localhost, bare name) is its own domain
      .when(two.rlike("^(co\\.uk|com\\.au|co\\.jp|com\\.br|co\\.in)$") &&
        three =!= "", three)
      .otherwise(two)
  }

  /** Host of a canonical URL (post-[[canonicalizeUrl]], so no port/www
    * handling needed here).
    */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?]*)", 1)

  /** Pinned public-suffix fixture — a real-PSL snapshot subset (plain
    * rules only; the live list's wildcard/exception entries are the
    * declared out-of-scope tail). Includes MULTI-LEVEL private-section
    * entries (`github.io`, `blogspot.com`, `s3.amazonaws.com`) — exactly
    * the cases where [[registeredDomain]]'s LITE rule diverges from the
    * PSL answer, so `web_domain_psl` can prove the join-based form does
    * something the regex rule can't. A production deployment swaps this
    * Seq for the full publicsuffix.org list; nothing else changes.
    */
  val publicSuffixes: Seq[String] = Seq(
    "com", "org", "net", "io", "edu", "gov", "app", "dev",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au", "org.au",
    "jp", "co.jp", "ne.jp", "or.jp",
    "br", "com.br", "net.br", "org.br",
    "in", "co.in", "net.in", "org.in", "firm.in",
    "us", "de", "fr", "it", "nl", "es", "ru",
    "cn", "com.cn", "net.cn", "org.cn",
    "github.io", "blogspot.com", "s3.amazonaws.com",
    "herokuapp.com", "netlify.app", "pages.dev")

  /** Join-based registered domain against a broadcast public-suffix table
    * (the production form [[registeredDomain]]'s scaladoc promises):
    * registered domain = one label + the LONGEST suffix in `suffixes`
    * matching a dot-boundary tail of the host. Hosts that ARE a public
    * suffix map to themselves; hosts matching no suffix fall back to the
    * LITE rule (the PSL's own default for unknown TLDs is "last label is
    * the suffix", which is exactly the two-label rule).
    *
    * Scale shape: the suffix explode runs over DISTINCT hosts (site-scale,
    * not corpus-scale — a host has ≤ label-count tails), the suffix table
    * is broadcast, and the result joins back to `df` on host. Appends
    * `out` (default `reg_domain`) to `df` unchanged otherwise.
    */
  def registeredDomainPsl(df: DataFrame, hostCol: String, suffixes: DataFrame,
                          out: String = "reg_domain"): DataFrame = {
    val hosts = df.select(col(hostCol).as("host")).distinct()
    val labels = split(col("host"), "\\.")
    val tails = hosts.select(col("host"), explode(
      transform(sequence(lit(0), size(labels) - 1),
        i => array_join(slice(labels, i + 1, size(labels) - i), ".")))
      .as("tail"))
    // nested tails of one host have strictly distinct lengths, so the
    // longest-match argmax is a total order — no tie law needed
    val matched = tails
      .join(broadcast(suffixes.select(col("suffix").as("tail"))), Seq("tail"))
      .groupBy("host")
      .agg(max_by(col("tail"), length(col("tail"))).as("suffix"))
    val prefix = col("host").substr(
      lit(1), length(col("host")) - length(col("suffix")) - 1)
    val reg = hosts.join(matched, Seq("host"), "left")
      .select(col("host"),
        when(col("suffix").isNull, registeredDomain(col("host")))
          .when(col("host") === col("suffix"), col("host"))
          .otherwise(concat(regexp_extract(prefix, "([^.]+)$", 1),
            lit("."), col("suffix")))
          .as(out))
    df.join(reg, df(hostCol) === reg("host"), "left")
      .drop(reg("host"))
  }

  /** Damped PageRank over one weighted directed graph, on the 1e-9
    * integer grid — [[TextAnalysis.textrankKeywords]]'s exact arithmetic
    * (quantized contributions, `round((1−d)·10⁹) + floor(d·Σ + 0.5)`)
    * lifted from per-document graphs to a single corpus-level graph: the
    * host-centrality quality prior a crawl pipeline reads (Common Crawl
    * publishes exactly this ranking). Input `edges` needs (src, dst, wt);
    * returns (node, rq) after `iters` rounds from a uniform 10⁹ start
    * over the out-degree-positive nodes. Dangling sinks keep receiving
    * but stop forwarding — the standard simplification, replayed
    * identically by the SQL twin.
    *
    * Scale: each iteration is one keyed join + one keyed agg on the EDGE
    * table — the graph is host-sized (≈ sites, not pages), metadata-scale
    * next to the corpus that produced it. Persist the edge table in the
    * caller's scope; this loop re-reads it `iters` times.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy("src").agg(sum("wt").as("deg"))
    val ew = edges.join(deg, "src")
    var ranks = ew.select(col("src").as("node")).distinct()
      .withColumn("rq", lit(1000000000L))
    for (_ <- 1 to iters) {
      ranks = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .withColumn("contrib", floor(
          col("rq").cast("double") * col("wt") / col("deg") + 0.5).cast("long"))
        .groupBy(col("dst").as("node"))
        .agg((lit(math.round((1 - damping) * 1000000000.0)) +
          floor(lit(damping) * sum("contrib") + 0.5).cast("long")).as("rq"))
    }
    ranks
  }

  /** At most `cap` rows per group, best `rank` first (doc_id-ascending
    * tie-break) — the RefinedWeb per-domain cap: template-heavy domains
    * contribute their `cap` best documents instead of their whole crawl
    * volume. The absolute-cap sibling of
    * [[Curation.topFractionPerGroup]]; `row_number ≤ cap` plans as
    * WindowGroupLimit, so ≤ cap rows per group per partition survive the
    * shuffle — group cardinality (#domains) never materializes anywhere.
    */
  def capPerGroup(df: DataFrame, groupCol: String, rank: Column,
                  idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    require(!df.columns.contains("_rn"),
      "input already has a _rn column (internal name)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(rank.desc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  // ---- HTML → text extraction ----

  /** Deterministic HTML page synthesized from a document row — the fixture
    * generator for [[htmlExtract]] (the sandbox has no crawl corpus; same
    * generative-law idiom as the media assets): head with style + a
    * script whose body contains tag-like and entity-like bait, nav
    * boilerplate, an id-keyed optional comment wrapping markup, the
    * document text as the main block, an id-keyed section div, and a
    * footer exercising entity decode. Pure concat — one codegen'd
    * expression, replayed verbatim by the SQL twin.
    */
  def htmlFromLaw(docId: Column, text: Column): Column = concat(
    lit("<html><head><title>t</title><style>body{color:red}</style>" +
      "<script>if (1<2 && x>0) { track(\"&amp;\"); }</script></head>" +
      "<body><nav><a href=\"/\">home</a> | <a href=\"/d?id="),
    docId,
    lit("\">self</a></nav>"),
    when(docId % 3 === 0,
      lit("<!-- <p>commented markup is not content</p> -->"))
      .otherwise(lit("")),
    lit("<h1>Document "), docId, lit("</h1><p>"), text,
    lit("</p><div class=\"m\">section "), docId % 5,
    lit("</div><footer>&copy; 2026 example &amp; co &lt;archive&gt;" +
      "</footer></body></html>"))

  /** HTML → text blocks: (doc_id, block_no, block_text) — the standard
    * missing stage between a crawl and [[TextAnalysis.qualityScore]]
    * (trafilatura/C4's extraction step, re-expressed as deterministic
    * regex surgery so the DuckDB twin replays it byte-for-byte):
    *
    *   1. comments, script/style (WITH their bodies — tag-like and
    *      entity-like bait inside code must not surface as text), then the
    *      whole head are dropped;
    *   2. block-level closers (`</p> </div> </h1..6> </li> </nav>
    *      </footer> </section> </article> </ul> </ol> </table> </tr>`) and
    *      `<br>` become newlines — the block segmentation;
    *   3. every remaining tag is stripped;
    *   4. entities decode via pinned literal replaces, `&amp;` LAST (so
    *      `&amp;lt;` correctly yields the text `&lt;`, never `<`);
    *   5. blocks split on the newlines, inner whitespace runs collapse to
    *      one space, empty blocks drop, survivors number per document.
    *
    * Per-row string surgery + one per-doc window — linear, shuffle-free
    * until the tiny block numbering; 100 TB-indifferent like the rest of
    * the family. Known regex-extractor limit (shared by the twin, so
    * oracle-safe): a literal `<` in TEXT followed by a later `>` is eaten
    * by the tag-strip pass.
    */
  def htmlExtract(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    var t = col(htmlCol)
    t = regexp_replace(t, "(?s)<!--.*?-->", "")
    t = regexp_replace(t, "(?s)<script[^>]*>.*?</script>", "")
    t = regexp_replace(t, "(?s)<style[^>]*>.*?</style>", "")
    t = regexp_replace(t, "(?s)<head[^>]*>.*?</head>", "")
    t = regexp_replace(t,
      "</(p|div|h[1-6]|li|nav|footer|section|article|ul|ol|table|tr)>|<br[^>]*>",
      "\n")
    t = regexp_replace(t, "<[^>]*>", "")
    for ((ent, ch) <- Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&copy;" -> "(c)", "&amp;" -> "&"))
      t = replace(t, lit(ent), lit(ch))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    pages.select(col("doc_id"), posexplode(split(t, "\n")).as(Seq("pos", "raw")))
      .withColumn("block_text", trim(regexp_replace(col("raw"), "\\s+", " ")))
      .filter(col("block_text") =!= "")
      .withColumn("block_no", row_number().over(w).cast("long"))
      .select("doc_id", "block_no", "block_text")
  }
}
