package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface:
  * language ID, quality scoring, token counting, fingerprinting,
  * shingling. All pure `Column` expressions (codegen'd, pushdown- and
  * scale-friendly); no UDFs.
  */
object TextFunctions {

  /** Lowercased, punctuation-stripped, whitespace-collapsed text. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Distinct word tokens of the normalized text. */
  def wordSet(text: Column): Column = array_distinct(words(text))

  /** Ordered word tokens (with duplicates). Semantically identical to
    * `filter(split(normalize(text), " "), _ =!= "")` — tokens are the
    * maximal [a-z0-9] runs of the lowercased string — but computed by
    * ONE native byte walk ([[NormalizedWords]]) instead of two regex
    * passes + split + an interpreted HOF filter; equivalence with the
    * composed chain is spec-pinned (TextSpec).
    */
  def words(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NormalizedWords(ColumnBridge.expression(text)))
  }

  /** Distinct word k-gram shingles ("a b c" style), the unit for
    * MinHash / Jaccard dedup. Native single-pass expression — see
    * [[WordShingles]] for why not a transform/slice HOF chain.
    */
  def shingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words(text)), k))
  }

  private val stop = Map(
    "en" -> "\\b(the|and|is|of|to|in|that|it|was|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu|mit|auf)\\b",
    "fr" -> "\\b(le|la|les|et|est|un|une|que|pour|dans)\\b",
    "es" -> "\\b(el|los|las|y|es|un|una|que|por|para)\\b")
  private val zhChars = "[\\x{4e00}-\\x{9fff}]"

  def stopwordHits(text: Column, lang: String): Column =
    regexp_count(lower(text), lit(stop(lang)))

  def zhCharCount(text: Column): Column = regexp_count(text, lit(zhChars))

  /** Heuristic language ID over {en,de,fr,es,zh}: CJK-character count
    * dominates, otherwise argmax of per-language stopword hits with a
    * fixed priority order for ties (deterministic — required for the
    * oracle hash compare).
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en"); val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr"); val es = stopwordHits(text, "es")
    when(zhCharCount(text) >= 5, lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  def wordCount(text: Column): Column = regexp_count(text, lit("\\S+"))
  def punctCount(text: Column): Column = regexp_count(text, lit("[.,!?;:]"))
  def digitCount(text: Column): Column = regexp_count(text, lit("[0-9]"))

  /** BPE-ish subword token count: letter runs, digit runs, punct runs. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"))

  /** Deterministic [0,1] quality score from surface statistics
    * (length, punctuation density, stopword density) — the usual
    * first-pass web-corpus filter signals.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val wc = wordCount(text).cast("double")
    val lengthOk = when(nChars.between(100, 10000), lit(1.0)).otherwise(lit(0.5))
    val punctRatio = punctCount(text).cast("double") / greatest(wc, lit(1.0))
    val stopRatio = stopwordHits(text, "en").cast("double") / greatest(wc, lit(1.0))
    val punctOk = when(punctRatio <= 0.3, lit(1.0)).otherwise(lit(0.5))
    round(lengthOk * 0.4 + punctOk * 0.3 + least(stopRatio * 2.0, lit(1.0)) * 0.3, 6)
  }

  /** Content fingerprints: full md5 plus a 64-bit-ish hex prefix. */
  def fingerprint(text: Column): Column = md5(text)
  def fingerprintPrefix(text: Column): Column = substring(md5(text), 1, 16)

  // --- PII scrubbing (training corpora are scrubbed before use; the
  // patterns are the standard high-precision trio). RE2 (DuckDB) and
  // java.util.regex agree on these constructs (char classes, bounded
  // repetition, \b), which the oracle's hash gate verifies per run.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))

  /** Replace emails, then IPv4s, then phone-like runs with typed
    * placeholder tags. Order matters: the phone pattern must not see
    * digit runs that are really IP octets (dots already collapsed to
    * `<IP>`), and neither may consume an address already tagged
    * (`<`/`>` are outside every class).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
}
