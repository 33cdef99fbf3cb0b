package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass every
  * large-scale training-data pipeline runs before a corpus ships (emails,
  * IPv4 addresses, phone numbers → counted and masked).
  *
  * All patterns avoid backreferences and lookarounds so the SAME pattern
  * string is valid (with identical match semantics: leftmost-first, greedy
  * quantifiers) in Java's regex engine (Spark) and RE2 (the DuckDB oracle).
  * Detection and redaction are pure per-row `regexp_count`/`regexp_replace`
  * expressions: codegen'd, no UDF, no shuffle — the scan cost IS the
  * operator cost at any scale.
  */
object PiiFunctions {

  /** `local@domain.tld` with an alphabetic TLD (so an IP-host mailbox like
    * `x@10.0.0.1` is counted as an IP, not an email). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 on word boundaries. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Dashed international-style phone (the TPC-H `NN-NNN-NNN-NNNN` shape). */
  val PhonePattern = "\\b\\d{2,3}-\\d{3}-\\d{3}-\\d{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Pattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern))

  /** Masks all three PII classes. Replacement order (email → IP → phone) is
    * part of the contract: an email is consumed before its host part could
    * be re-matched as an IP, and the order is mirrored verbatim in the
    * oracle SQL. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")
}
