package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and scrubbing over `documents(doc_id, text, ...)` —
  * the redaction pass a training-data pipeline runs before anything
  * leaves the corpus (emails, IPv4 addresses, E.164-style phone
  * numbers are the classes virtually every published pipeline scrubs).
  *
  * Everything here is per-row regex over Spark's codegen'd
  * `RegExpExtractAll`/`RegExpReplace` builtins — no UDF, no shuffle,
  * and the patterns are deliberately portable between Java regex and
  * RE2 (no backreferences, no lookaround), so the independent q22
  * DuckDB oracle runs the SAME patterns (with RE2's mandatory 'g'
  * flag; Spark's regexp_replace is global by default).
  *
  * Recall/precision posture: patterns are conservative detectors for
  * the unambiguous spellings (a phone number must carry its '+'
  * country prefix; an IPv4 must be a word-bounded dotted quad). A
  * production pipeline layers NER on top for free-text names — out of
  * scope here, like the m1/m2 codec stub, because no model weights
  * ship in this sandbox; the Spark-side shape (projection, column
  * contract, replacement-token protocol) is the real, tested part.
  *
  * Scrub order matters and is pinned: emails first (an email's host
  * can contain a dotted quad — scrubbing IPs first would tear the
  * address in half), then IPs, then phones. `scrub` is idempotent:
  * replacement tokens contain no '@', no dotted quad, and no '+digits'
  * run, so a second pass is the identity (PiiSpec gates this).
  */
object Pii {

  /** RFC-5322-lite mailbox: local part, '@', dotted host with an
    * alphabetic TLD of length >= 2.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Word-bounded dotted quad (syntactic: octet range not enforced —
    * the scrub must over-approximate, not validate).
    */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** E.164-style international number: '+' then 7–15 digits. */
  val PhoneRe = "\\+[0-9]{7,15}"

  def nEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")

  def nIpv4(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long")

  def nPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")

  /** Replace every PII match with its class token, fixed order
    * (emails → IPs → phones; see scaladoc above).
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII accounting + scrubbed-text digest (q22): counts
    * per class, md5 + length of the scrubbed text. The digest (rather
    * than the text itself) keeps the gate result small and lets the
    * DuckDB oracle hash-compare the actual scrub output.
    */
  def stats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      nEmails(col("text")).as("n_emails"),
      nIpv4(col("text")).as("n_ipv4"),
      nPhones(col("text")).as("n_phones"),
      md5(scrub(col("text"))).as("scrub_md5"),
      length(scrub(col("text"))).cast("long").as("scrub_len"))
      .orderBy("doc_id")
}
