package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction: scrub emails, IPv4 addresses, phone numbers, and
  * SSN-shaped ids from a text column, and report how many of each were
  * removed — the standard privacy-hygiene pass an LLM training pipeline
  * runs before anything else sees the text. The reference engine has no
  * equivalent; judged pipeline extension alongside SURVEY §2.
  *
  * Design constraints:
  *  - Patterns stay in the portable regex subset (no lookaround, no
  *    backreferences) so they mean the same thing to Java's engine, RE2,
  *    and PCRE — the DuckDB oracle runs the identical patterns.
  *  - Replacement placeholders contain no digits or '@'/'.', so one
  *    rule's output can never create a NEW match for a later rule. Rule
  *    order still matters where original matches overlap (an ip-shaped
  *    email local part): the earlier rule wins; order is fixed and the
  *    oracle applies the same order.
  *  - Everything is `regexp_replace`/`regexp_count` over one projection:
  *    per-row, codegen'd, zero shuffles — the operator adds nothing to
  *    the job's exchange graph at any scale.
  */
object Redact {

  /** (pattern, placeholder) in application order. */
  val rules: Seq[(String, String)] = Seq(
    // email before ip/phone: an address can embed digit runs
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // dotted quad; \b keeps it off longer digit/dot runs
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    // +CC NNN-NNN-NNNN style international numbers; trailing \b so a
    // longer digit run (5+ tail digits) is not phone-shaped
    ("\\+[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}\\b", "<PHONE>"),
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))

  private val countCols = Seq("n_emails", "n_ips", "n_phones", "n_ssns")

  /** The scrubbed text: every rule applied in order. */
  def scrubbed(text: Column): Column =
    rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Adds `<textCol>_clean` plus n_emails/n_ips/n_phones/n_ssns counts.
    * Counts answer "how many of each did the ORIGINAL text contain" — each
    * pattern counted independently on the raw text, so a substring that is
    * both ip-shaped and part of an email (`1.2.3.4@e.io`) counts under
    * both classes even though the scrub (applied in rule order) redacts it
    * once as the earlier class.
    */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = rules.zip(countCols).foldLeft(df) {
      case (d, ((pat, _), cc)) =>
        d.withColumn(cc, regexp_count(col(textCol), lit(pat)))
    }
    withCounts.withColumn(s"${textCol}_clean", scrubbed(col(textCol)))
  }

  /** Gate: rows whose text contains no PII at all (cheap pre-filter for
    * pipelines that drop rather than rewrite). */
  def clean(df: DataFrame, textCol: String = "text"): DataFrame =
    scrub(df, textCol)
      .filter(countCols.map(col(_) === 0).reduce(_ && _))
      .drop((countCols :+ s"${textCol}_clean"): _*)
}
