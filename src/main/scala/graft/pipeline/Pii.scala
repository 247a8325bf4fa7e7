package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * US-SSN-shaped ids, phone numbers, IPv4 addresses. Everything is a
  * pure column expression over Java-regex patterns restricted to the
  * RE2-compatible subset (no backreferences, no lookaround), so the
  * same patterns run codegen'd inside the scan's WholeStageCodegen
  * span here and verbatim in any RE2-based oracle engine. At 100 TB
  * this is a map-only pass — no shuffle, no UDF, no state.
  */
object Pii {

  /** RE2/Java-common patterns. Order matters for redaction: emails
    * first (their local parts can contain digits and dots), then the
    * dash-digit shapes (SSN 3-2-4 vs phone 3-3-4 are disjoint under
    * \b anchoring), then bare IPv4.
    */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def count(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  def emailCount(c: Column): Column = count(c, Email)
  def ssnCount(c: Column): Column = count(c, Ssn)
  def phoneCount(c: Column): Column = count(c, Phone)
  def ipv4Count(c: Column): Column = count(c, Ipv4)

  /** Total PII hits of any category. */
  def piiCount(c: Column): Column =
    emailCount(c) + ssnCount(c) + phoneCount(c) + ipv4Count(c)

  /** Replace every PII hit with a typed placeholder token. Placeholder
    * text is letters-only so one category's replacement can never
    * create a match for a later category.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, Email, "<EMAIL>"),
          Ssn, "<SSN>"),
        Phone, "<PHONE>"),
      Ipv4, "<IP>")
}
