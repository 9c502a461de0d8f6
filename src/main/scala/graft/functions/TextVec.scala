package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/vector column expressions for the data-pipeline
  * operators. Built from `org.apache.spark.sql.functions` expressions
  * (no UDFs) so the same logic is expressible verbatim in the DuckDB
  * oracle SQL — with the measured exception below: higher-order
  * functions evaluate their lambda INTERPRETED per element, and the
  * hottest one (shingling, paid by every MinHash/Jaccard/banding pass
  * corpus-wide) graduated to a native expression in r17.
  */
object TextVec {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles from a token array — since r17 the native
    * [[WordNgrams]] expression (one fused codegen pass; the former
    * `transform(sequence, concat_ws(element_at...))` HOF measured
    * ~8× the cost of the sha-256 minhash fold it feeds, see the
    * WordNgrams scaladoc). Value-exact with the HOF, parity-spec'd,
    * including the below-n-tokens (and null-array) empty-array guard
    * the HOF's `when` provided. Registration needs a session;
    * `SparkSession.active` is the constructing thread's session, and
    * [[WordNgrams.apply]] additionally registers on the default
    * session so a DataFrame analyzed by a DIFFERENT session (the
    * analysis-time resolution `call_function` does) still resolves. */
  def shingles(toks: Column, n: Int): Column =
    WordNgrams(org.apache.spark.sql.SparkSession.active, toks, n)

  /** Strictly sequential left-to-right double dot product — matches
    * DuckDB's `list_sum(list_transform(...))` evaluation order so the
    * floating-point result is comparable after rounding.
    */
  def dot(a: Column, b: Column): Column = {
    val prods = zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y)
    aggregate(prods, lit(0.0), (acc, x) => acc + x)
  }

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Count of tokens that appear in a fixed vocabulary. */
  def hits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab: _*)))

  /** Longest run in a SORTED array == the max element multiplicity,
    * found in ONE linear pass — the scalable replacement for
    * re-filtering the whole array per distinct element
    * (O(distinct × len), quadratic on a long diverse document).
    * Integer counts, so the result is order-independent and matches
    * the oracle's `list_max(list_transform(list_distinct(...)))`.
    */
  def maxRunSorted(sorted: Column): Column =
    sortedRunStats(sorted).getField("max_run")

  /** (distinct count, max multiplicity) of a SORTED array, both from
    * the SAME linear run-length pass — one aggregate instead of an
    * `array_distinct` walk plus a [[maxRunSorted]] walk when a caller
    * needs both (the repetition signals do). Returns
    * struct<n_distinct:int, max_run:int>; values match the oracle's
    * `len(list_distinct(..))` and max-multiplicity exactly.
    *
    * PRECONDITION: null-free elements. The fold seeds `prev` with
    * null, so a null ELEMENT would merge into the seed state and
    * undercount (`array_distinct`/`list_distinct` count null as a
    * value). Every current caller feeds arrays built by
    * `split`/`transform`+`concat_ws`, which never yield null
    * elements; revisit the seed (e.g. a sentinel struct flag) before
    * pointing this at a nullable-element column. */
  def sortedRunStats(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"),
        lit(0).as("run"), lit(0).as("best"), lit(0).as("nd")),
      (st, x) => {
        val same = st.getField("prev") <=> x
        val run = when(same, st.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"),
          (st.getField("nd") + when(same, 0).otherwise(1)).as("nd"))
      },
      st => struct(st.getField("nd").as("n_distinct"),
        st.getField("best").as("max_run")))
}
