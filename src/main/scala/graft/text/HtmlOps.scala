package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the markup-stripping front of a web-corpus
  * pipeline (RefinedWeb-style: drop script/style/comment/title blocks,
  * keep block structure as newlines, strip tags, decode the common
  * entities, and surface the link-density signals boilerplate filters
  * cut on). Engine addition: the reference has no markup handling.
  *
  * Pure per-row regex/string expressions (codegen'd, zero shuffle). The
  * regex subset is chosen to mean the same thing in Java regex and RE2
  * (non-greedy, inline `(?is)` flags, character classes — no
  * lookarounds, no backrefs), so a DuckDB oracle replays it; the gate
  * query's oracle instead derives the expected text INDEPENDENTLY from
  * the raw fields. Entity decode order puts `&amp;` last, so a
  * double-escaped `&amp;lt;` decodes one level (to `&lt;`), not two.
  *
  * Link metrics are computed on the pre-strip markup: `n_links` anchors
  * and the total length of their inner text — `link_chars/n_chars` is
  * the classic nav/boilerplate discriminator. */
object HtmlOps {

  private def stripBlocks(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noTitle = regexp_replace(noStyle, "(?is)<title[^>]*>.*?</title>", "")
    regexp_replace(noTitle, "(?s)<!--.*?-->", "")
  }

  private def decodeEntities(c: Column): Column = {
    // &amp; LAST: single-level decode for double-escaped input
    val steps = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (col0, (from, to)) => replace(col0, lit(from), lit(to)) }
  }

  /** Extracted text column: blocks dropped, block-level closers become
    * newlines, tags stripped, entities decoded, whitespace normalized
    * (runs of spaces collapse, blank-line runs collapse to one blank
    * line, leading/trailing newlines and spaces trimmed). */
  def extractText(html: Column): Column = {
    val blocks = stripBlocks(html)
    val breaks = regexp_replace(blocks,
      "(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol)[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]+>", "")
    val decoded = decodeEntities(noTags)
    val sp = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val tight = regexp_replace(regexp_replace(sp, " *\\n *", "\n"), "\\n{3,}", "\n\n")
    trim(regexp_replace(tight, "^\\n+|\\n+$", ""))
  }

  /** Anchor inner-text character count + anchor count, measured on the
    * block-stripped markup (nav/footer links included — that is the
    * point of the signal). */
  def linkStats(html: Column): (Column, Column) = {
    val anchors = regexp_extract_all(stripBlocks(html),
      lit("(?is)<a[^>]*>.*?</a>"), lit(0))
    val innerLens = transform(anchors,
      a => length(decodeEntities(regexp_replace(a, "<[^>]+>", ""))))
    (size(anchors).cast("long"),
      aggregate(innerLens, lit(0L), (acc, x) => acc + x))
  }

  /** Full extraction: id, text, n_chars, n_paras (non-empty lines),
    * n_links, link_chars. One projection, no shuffle. */
  def htmlExtract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val (nLinks, linkChars) = linkStats(col(htmlCol))
    docs.select(col(idCol), extractText(col(htmlCol)).as("text"),
        nLinks.as("n_links"), linkChars.as("link_chars"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_paras",
        size(filter(split(col("text"), "\n"), l => l =!= "")).cast("long"))
  }
}
