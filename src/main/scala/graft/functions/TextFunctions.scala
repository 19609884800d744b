package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared, oracle-stable text primitives. All composed from codegen'd
  * builtins; the exact token/shingle definitions are mirrored verbatim in
  * the DuckDB oracle SQL, so any change here must change the oracles too.
  */
object TextFunctions {

  /** Lowercase word tokens — semantically "split on non-alphanumeric
    * runs, drop empties". Production form: the fused byte-scan
    * expression (one unicode lowercase + one ASCII run scan, zero-copy
    * slices); `tokensRegex` is the reference regexp form it is certified
    * byte-identical to (spec: corpus-wide + adversarial unicode).
    */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      AsciiTokens(org.apache.spark.sql.GraftSqlShim.expression(text)))

  /** The original single-regexp form — kept as the certification
    * reference for [[tokens]] (the split+filter(lambda) form costs 3×
    * more: the higher-order filter is interpreted per element).
    */
  def tokensRegex(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Distinct 3-gram word shingles (the MinHash/Jaccard unit). Documents
    * with fewer than 3 tokens get an empty set. Production form: the
    * fused one-pass expression; `shingles3Composed` is the built-in
    * composition it is certified identical to.
    */
  def shingles3(toks: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      Shingles3(org.apache.spark.sql.GraftSqlShim.expression(toks)))

  /** Reference composition for [[shingles3]] (five expression layers,
    * three intermediate arrays per row).
    */
  def shingles3Composed(toks: Column): Column = {
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(0))),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    array_distinct(when(size(toks) >= 3, grams).otherwise(array()))
  }

  /** BPE-ish subword-boundary tokens: alphanumeric runs OR single
    * non-alnum-non-space chars (punctuation counts as its own token, the
    * way byte-pair vocabularies treat it).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))
}
