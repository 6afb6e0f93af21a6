package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data curation, built
  * from codegen'd `functions._` primitives only (no UDFs). Every
  * function here has an exactly-equivalent ANSI-SQL formulation, so
  * the driver's DuckDB oracle can hash-check results.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * punctuation — the shape GPT-style tokenizers split on first. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Non-overlapping occurrence count of `marker` in ` text ` (padded,
    * lower-cased) via the replace-length identity — integer-exact and
    * reproducible in any SQL engine. */
  def markerCount(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("long")
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: the point is the distributed
    * scoring pattern, not lexicography. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " is "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(m => markerCount(text, m))
      .reduce(_ + _)

  /** argmax over language scores with fixed priority tie-break;
    * "und" (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val s = langMarkers.map { case (l, _) => l -> langScore(text, l) }.toMap
    when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es") && s("en") > 0, "en")
      .when(s("de") >= s("fr") && s("de") >= s("es") && s("de") > 0, "de")
      .when(s("fr") >= s("es") && s("fr") > 0, "fr")
      .when(s("es") > 0, "es")
      .otherwise("und")
  }

  val enStopwords: Seq[String] =
    Seq(" the ", " a ", " and ", " of ", " to ", " in ", " is ")

  /** Stopword hits (padded-replace counting, overlap-free). */
  def stopwordCount(text: Column): Column =
    enStopwords.map(m => markerCount(text, m)).reduce(_ + _)

  /** 4-decimal truncation. For scalar per-row metrics the input
    * doubles are bit-identical in any IEEE engine, so floor-scaling is
    * exactly reproducible — unlike round(), whose half-way tie rule
    * differs between engines (Spark HALF_UP vs C-style rounding). */
  def scale4(c: Column): Column = floor(c * 10000) / 10000

  /** Ratio of [a-z] characters after lower-casing. */
  def alphaRatio(text: Column): Column =
    scale4(length(regexp_replace(lower(text), "[^a-z]", "")).cast("double") /
      length(text))

  /** Mean token length (whitespace removed / token count). */
  def avgTokenLen(text: Column): Column =
    scale4(length(regexp_replace(text, "\\s", "")).cast("double") / tokenCountWs(text))

  /** Composite quality score in [0,1]-ish: favors mid-length docs
    * with natural stopword density and alphabetic content. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountWs(text)
    val stopRatio = stopwordCount(text).cast("double") / nTok
    val lenTerm = least(nTok.cast("double") / lit(64.0), lit(1.0))
    scale4(lit(0.4) * lenTerm + lit(0.3) * least(stopRatio * 4, lit(1.0)) +
      lit(0.3) * alphaRatio(text))
  }

  /** Distinct word k-shingles ("w1 w2 w3") — MinHash input. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Distinct character n-grams (on the raw string). */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
        .otherwise(array(text)))
}
