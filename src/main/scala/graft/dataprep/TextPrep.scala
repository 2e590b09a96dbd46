package graft.dataprep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Tokenizers

/** Shared text-preparation columns for the dedup / analysis operators.
  * Every expression here has an exact DuckDB mirror (documented inline)
  * so results are oracle-comparable bit for bit.
  */
object TextPrep {

  /** Word tokens. DuckDB mirror:
    * list_filter(string_split_regex(lower(x), SepRegex), t -> t <> '')
    */
  def tokens(text: Column): Column =
    Tokenizers.textTokens(text, caseSensitive = false)

  /** Distinct word-bigram shingles, the unit for n-gram Jaccard /
    * MinHash. DuckDB mirror:
    * list_distinct(list_filter(list_transform(range(1, greatest(len(t),2)),
    *   i -> t[i] || ' ' || t[i+1]), x -> x IS NOT NULL))
    * (out-of-bounds element access yields NULL in both engines —
    * Spark side uses try_element_at because ANSI mode is on.)
    */
  def bigramShingles(toks: Column): Column =
    array_distinct(filter(
      transform(
        sequence(lit(1), greatest(size(toks) - 1, lit(1))),
        i => concat(try_element_at(toks, i), lit(" "), try_element_at(toks, i + 1))),
      x => x.isNotNull))

  /** Distinct character n-gram shingles. DuckDB mirror:
    * list_distinct(list_transform(range(1, greatest(length(s)-n+2, 2)),
    *   i -> substr(s, i, n)))
    */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring(text, i, lit(n))))

  private def substring(c: Column, pos: Column, len: Column): Column =
    c.substr(pos, len)
}
