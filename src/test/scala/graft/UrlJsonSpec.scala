package graft

import graft.text.{JsonOps, UrlOps}
import org.apache.spark.sql.functions._

class UrlJsonSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizeUrl: case, www, fragment, tracking params, trailing slash, param sort") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM/A/b/?utm_source=x&z=1&a=2#frag",
      "http://example.com/A/b?a=2&z=1",
      "https://sub.host.org/",          // root path survives as /
      "https://host.org/p?utm_campaign=c&gclid=g&fbclid=f&ref=r", // all tracked
      "https://host.org/p"              // no query at all
    ).toDF("u")
    val got = urls.select(UrlOps.canonicalizeUrl(col("u"))).as[String].collect()
    assert(got(0) == "https://example.com/A/b?a=2&z=1")
    assert(got(1) == "http://example.com/A/b?a=2&z=1", "already canonical form")
    assert(got(0) == got(1).replace("http://", "https://"))
    assert(got(2) == "https://sub.host.org/")
    assert(got(3) == "https://host.org/p", "fully-tracked query drops entirely")
    assert(got(4) == "https://host.org/p")
  }

  test("registrableDomain: last two labels, port and case stripped") {
    val got = Seq("https://WWW.a.b.Example.COM:8443/x", "http://host.org/")
      .toDF("u").select(UrlOps.registrableDomain(col("u"))).as[String].collect()
    assert(got(0) == "example.com")
    assert(got(1) == "host.org")
  }

  test("domainQuota keeps exactly min(cap, group) md5-smallest ids per domain") {
    val docs = (1L to 40L).map(i => (i, s"https://d${i % 3}.com/p$i")).toDF("id", "url")
    val kept = UrlOps.domainQuota(docs, "id", "url", maxPerDomain = 5)
    val byDom = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(_ == 5) && byDom.size == 3)
    // determinism: same result on a different partitioning
    val kept2 = UrlOps.domainQuota(docs.repartition(7), "id", "url", 5)
    assert(kept.select("id").as[Long].collect().sorted.sameElements(
      kept2.select("id").as[Long].collect().sorted))
  }

  test("htmlExtract: blocks dropped, structure kept, entities decoded, link stats") {
    val html = Seq((1L,
      """<html><head><title>T</title><script>if(a<b){}</script><style>p{}</style></head>""" +
      """<body><ul><li>One</li><li>Two &amp; Three</li></ul>""" +
      """<p>Say &quot;hi&quot; &#39;now&#39;</p><!-- hidden -->""" +
      """<p>Double &amp;lt; escape</p>""" +
      """<div><a href="/x">Link<b>Bold</b></a></div></body></html>""")).toDF("id", "h")
    val r = graft.text.HtmlOps.htmlExtract(html, "id", "h").collect()(0)
    val text = r.getString(1)
    // </li></ul> produces a blank line — block separation is kept; runs
    // of 3+ newlines would collapse to the same blank line
    assert(text == "One\nTwo & Three\n\nSay \"hi\" 'now'\nDouble &lt; escape\nLinkBold",
      s"got: ${text.replace("\n", "\\n")}")
    assert(r.getLong(2) == 1, "one anchor")          // n_links
    assert(r.getLong(3) == 8, "Link+Bold inner text") // link_chars
    assert(r.getLong(5) == 5)                         // n_paras
  }

  test("urlBlocklist: alternation matches canonical form, not the raw url") {
    // raw has utm params + uppercase; the block pattern targets the
    // canonical host — must still match
    val docs = Seq((1L, "HTTPS://WWW.Bad-3.COM/x?utm_source=a&id=1"),
      (2L, "https://good.com/p5?id=2")).toDF("id", "u")
    val r = graft.text.UrlOps.urlBlocklist(docs, "u", Seq("://bad-3\\.com/"))
      .select("id", "blocked").collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r(1L) && !r(2L))
  }

  test("compressionRatio: repetitive < diverse, empty = 1.0, partition-stable") {
    val docs = Seq(
      (1L, "spam " * 200),
      (2L, (0 until 1000).map(i => ((i * 7919 % 90) + 33).toChar).mkString),
      (3L, "")).map { case (i, t) => (i, t) }.toDF("id", "t")
    val r = graft.text.TextOps.compressionRatio(docs, "id", "t")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L)._3 < 0.05, s"template spam compresses hard: ${r(1L)}")
    assert(r(2L)._3 > r(1L)._3 * 5, "diverse text compresses far less")
    assert(r(3L) == ((0L, 8L, 1.0)), "empty doc: 8-byte empty zlib stream, ratio pinned 1.0")
    val r2 = graft.text.TextOps.compressionRatio(docs.repartition(5), "id", "t")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r.forall { case (k, v) => r2(k) == v._3 }, "partitioning-independent")
  }

  test("scriptProfile: counts per script, dominant with fixed tie order") {
    val d = Seq((1L, "abc Привет Привет мир"), (2L, "你好"), (3L, "123 .,"))
      .toDF("id", "t")
    val p = graft.text.TextOps.scriptProfile(d, "id", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getLong(2) == 3 && p(1L).getLong(3) == 15) // latin, cyrillic
    assert(p(1L).getString(8) == "cyrillic")
    assert(p(2L).getLong(4) == 2 && p(2L).getString(8) == "han")
    assert(p(3L).getLong(6) == 3 && p(3L).getString(8) == "none")
  }

  test("jsonProfile: escaped strings, unicode and null values survive parity rules") {
    // pins the cross-engine facts q263 relies on: Jackson and DuckDB both
    // unescape scalar strings, both keep nested objects minified WITH
    // re-escaped quotes, and null-valued paths count in n but not in
    // n_distinct or any type bucket
    val df = Seq("""{"s": "a\"b, c", "u": "xéy", "n": null, "o": {"q": "d\"e"}}""")
      .toDF("j")
    val p = JsonOps.jsonProfile(df, "j", maxDepth = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("s").getString(9) == "a\"b, c")
    assert(p("u").getString(9) == "xéy")
    assert(p("o").getString(9) == """{"q":"d\"e"}""", "minified re-escaped object text")
    assert(p("o.q").getString(9) == "d\"e")
    assert(p("n").getLong(1) == 1 && p("n").getLong(2) == 0,
      "null path counts occurrences but no distinct values")
    assert((3 to 8).forall(i => p("n").getLong(i) == 0), "null hits no type bucket")
  }

  test("jsonProfile: paths, nesting, lexical types, null json skipped") {
    val df = Seq(
      """{"a": 1, "s": "x", "o": {"b": 2.5, "c": [1,2]}, "f": true}""",
      """{"a": 7, "s": "y", "o": {"b": 3.5}}""",
      null
    ).toDF("j")
    val p = JsonOps.jsonProfile(df, "j", maxDepth = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("a", "s", "o", "f", "o.b", "o.c"))
    assert(p("a").getLong(1) == 2 && p("a").getLong(3) == 2)   // n, n_int
    assert(p("o.b").getLong(4) == 2)                            // n_num
    assert(p("f").getLong(5) == 1)                              // n_bool
    assert(p("o").getLong(6) == 2)                              // n_obj
    assert(p("o.c").getLong(7) == 1)                            // n_arr
    assert(p("s").getLong(8) == 2 && p("s").getString(9) == "x") // n_str, min_v
  }
}
