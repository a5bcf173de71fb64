package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / provenance scrubbing — the curation steps every released
  * pretraining corpus runs (Dolma's PII pass redacts emails, phone numbers
  * and IP addresses; C4 drops documents from blocklisted domains). Both are
  * pure per-row projections over the text column — zero shuffle, fused into
  * the scan — with a tiny broadcast relation for the blocklist.
  *
  * Cross-engine determinism: patterns use ONLY explicit character classes —
  * no `\s`/`\w` shorthands (Java's `\s` includes `\x0B`, RE2's does not —
  * the one place Java and DuckDB regex semantics silently diverge on
  * curation-shaped patterns) and no lookarounds (RE2 has none). Matching is
  * leftmost-first non-overlapping in both engines, and redaction applies
  * the three passes in one fixed order (email → IP → phone) so a redacted
  * span can never be re-matched by a later pass differently per engine.
  */
object Scrub {

  /** RFC-822-ish practical email matcher (the Dolma-grade pattern, not a
    * full grammar): localpart@domain.tld. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like 1.2.3.4.5
    * don't half-match. `\b` is identical in Java and RE2. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Phone-shaped digit runs: optional +, then 8+ chars of digits,
    * separators (space, dash, parens, dot), ending in a digit. Runs AFTER
    * the IP pass, which has already redacted dotted quads that would
    * otherwise shadow into this class. */
  val PhoneRe = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"

  /** Per-doc PII profile + redacted text: (idCol, n_emails, n_ips,
    * n_phones, clean). Counts are taken on the text each pass actually
    * sees (emails on raw, IPs on email-redacted, phones on IP-redacted),
    * matching what the redaction removes — count and redaction can't
    * disagree. Sentinels deliberately contain no digits or `@`, so a
    * redacted span can never re-match a later pattern.
    */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    docs.select(col(idCol),
        size(regexp_extract_all(t0, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        t1.as("__t1"), t2.as("__t2"), t3.as("__t3"))
      .select(col(idCol), col("n_emails"),
        size(regexp_extract_all(col("__t1"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(col("__t2"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        col("__t3").as("clean"))
  }

  /** URL extraction: `https?://` up to the next space or quote (the C4
    * tokenizer convention — URLs in prose end at whitespace). */
  val UrlRe = "https?://[^ \"]+"

  /** Host of one extracted URL (group 1): everything up to the first
    * `/`, `:`, space or quote after the scheme. */
  val HostRe = "^https?://([^/: \"]+)"

  /** Per-doc domain-blocklist profile (the C4 filter): (idCol, n_urls,
    * n_blocked, keep). A doc is kept iff NONE of its URL hosts lands in
    * `blocklist` (a `domain`-column relation, broadcast — blocklists are
    * thousands of rows, never corpus-scale). Host matching is exact on the
    * lowercased host; subdomain policy stays with the blocklist author
    * (list both `ads.x.com` and `x.com` to block both).
    *
    * Shape: explode to (doc, host) rows only for docs that HAVE urls, one
    * broadcast semi-probe, aggregate back — the corpus-side cost is the one
    * projection; docs with no URLs never explode.
    */
  def urlBlocklistFlags(docs: DataFrame, idCol: String, textCol: String,
                        blocklist: DataFrame): DataFrame = {
    val hosts = docs
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(UrlRe), lit(0))).as("__url"))
      .select(col(idCol),
        lower(regexp_extract(col("__url"), HostRe, 1)).as("domain"))
    val perDoc = hosts
      .join(broadcast(blocklist.select(lower(col("domain")).as("domain"))
        .withColumn("__blocked", lit(1L))), Seq("domain"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_urls"),
        sum(coalesce(col("__blocked"), lit(0L))).as("n_blocked"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_urls"), lit(0L)).as("n_urls"),
        coalesce(col("n_blocked"), lit(0L)).as("n_blocked"),
        (coalesce(col("n_blocked"), lit(0L)) === 0L).as("keep"))
  }
}
