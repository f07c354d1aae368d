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
