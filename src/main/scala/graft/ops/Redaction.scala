package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for training-data curation: emails, IPv4
  * addresses, and NANP-style phone numbers — the patterns a web-scale
  * corpus must strip before pre-training.
  *
  * Every operator is a pure column expression (codegen'd regex, no UDF)
  * and per-row (no shuffle): a 100 TB corpus maps straight through the
  * projection. Patterns are ASCII-anchored and engine-portable (the same
  * regex compiles identically under Java regex and RE2, so the DuckDB
  * oracle reproduces the counts and redactions byte-for-byte).
  */
object Redaction {

  /** Engine-portable PII patterns, applied in this order (email first so
    * the user@host digits can't be half-claimed by the phone pattern). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** Scrub all three PII classes, replacing each match with a typed
    * placeholder. Order matters and is part of the contract: emails,
    * then IPs, then phones — each pass sees the previous pass's output. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-document PII audit: class counts plus the scrubbed text —
    * the projection a curation pipeline writes back to the corpus.
    * Each count is taken on the text THAT PASS sees (emails on the raw
    * text, IPs on the email-redacted text, phones on the IP-redacted
    * text), so every count equals the number of placeholders its pass
    * emits — overlapping matches (an IPv4 inside an email's host, a
    * phone-shaped run inside an address) are attributed to exactly one
    * class, the one that consumed them. */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t1 = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Re, "[IP]")
    df.select(col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      size(regexp_extract_all(t1, lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(t2, lit(PhoneRe), lit(0))).as("n_phones"),
      regexp_replace(t2, PhoneRe, "[PHONE]").as("redacted"))
  }
}
