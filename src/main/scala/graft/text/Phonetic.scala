package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic blocking for entity resolution (engine addition): a
  * simplified Soundex key — first letter + the first three consonant
  * class codes after adjacent-duplicate collapse (classes per the
  * classic Soundex table; H/W/Y treated as vowels, a documented
  * deviation from American Soundex's separator rule so the whole key is
  * one codegen'd expression chain both engines replay: translate →
  * per-digit run collapse (RE2-safe, no backreferences) → strip zeros →
  * pad). Blocking on the key turns the O(n²) fuzzy-match into
  * per-block work — the phonetic complement of sortedNeighborhood's
  * lexicographic windows.
  *
  * Scale: pure per-row string expressions (no shuffle); the block
  * roll-up is one hash aggregate keyed by a 4-char code. */
object Phonetic {

  /** The 4-char phonetic key of `c` (letters only; null when no letters
    * survive). */
  def phoneticKey(c: Column): Column = {
    val up = upper(regexp_replace(c, "[^A-Za-z]", ""))
    val coded = translate(up,
      "BFPVCGJKQSXZDTLMNRAEIOUYHW",
      "11112222222233455600000000")
    // collapse each digit's runs without backreferences (RE2-safe)
    val collapsed = (1 to 6).foldLeft(coded)((e, d) =>
      regexp_replace(e, s"$d{2,}", s"$d"))
    val digits = regexp_replace(substring(collapsed, 2, 1000), "0", "")
    when(length(up) >= 1,
      concat(substring(up, 1, 1), rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** Phonetic blocking report: per key with ≥ 2 DISTINCT names, the
    * record count, distinct-name count and the lexicographically first
    * name — the "these spellings collide phonetically" ER candidate
    * list. Output: pkey, n, names, sample. */
  def phoneticBlocks(df: DataFrame, idCol: String, nameCol: String)
      : DataFrame = {
    df.where(col(nameCol).isNotNull)
      .select(col(idCol), col(nameCol).as("_nm"),
        phoneticKey(col(nameCol)).as("pkey"))
      .where(col("pkey").isNotNull)
      .groupBy(col("pkey"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("_nm")).as("names"),
        min(col("_nm")).as("sample"))
      .where(col("names") >= 2)
  }
}
