package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared, oracle-stable text primitives. All composed from codegen'd
  * builtins; the exact token/shingle definitions are mirrored verbatim in
  * the DuckDB oracle SQL, so any change here must change the oracles too.
  */
object TextFunctions {

  /** Lowercase word tokens — semantically "split on non-alphanumeric
    * runs, drop empties", implemented as a single codegen'd
    * regexp_extract_all (the split+filter(lambda) form costs 3× more: the
    * higher-order filter is interpreted per element).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Distinct 3-gram word shingles (the MinHash/Jaccard unit). Documents
    * with fewer than 3 tokens get an empty set.
    */
  def shingles3(toks: Column): Column = {
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
