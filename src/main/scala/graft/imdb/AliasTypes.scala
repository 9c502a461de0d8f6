package graft.imdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Decode `TitleAkas.types` — a string of concatenated vocabulary
  * tokens — against the closed vocabulary, in vocabulary order, with
  * substring consumption (reference: pimdb/database.py:39,1003-1029).
  *
  * Semantics replicated exactly: walk the vocabulary in declaration
  * order; whenever the token occurs in the *remaining* string, emit it
  * and delete **all** its occurrences; leftovers are unknown residue.
  * Output order is therefore vocabulary order, not appearance order.
  *
  * The reference memoizes per distinct input (lru_cache); the Spark
  * plan gets the same effect structurally — the build pipeline
  * `distinct()`s the types column before decoding (the reference's own
  * TODO at database.py:1066), so the UDF runs once per distinct value.
  */
object AliasTypes {

  /** reference: pimdb/database.py:39 — order matters. */
  val Vocabulary: Seq[String] = Seq(
    "alternative", "dvd", "festival", "tv", "video", "working",
    "original", "imdbDisplay")

  def decode(raw: String): Seq[String] = {
    if (raw == null || raw.isEmpty) Seq.empty
    else {
      var remaining = raw
      val out = Seq.newBuilder[String]
      Vocabulary.foreach { token =>
        if (remaining.contains(token)) {
          out += token
          remaining = remaining.replace(token, "")
        }
      }
      out.result()
    }
  }

  /** Unconsumed residue after decoding — non-empty means the closed
    * vocabulary is missing a token (the reference logs one warning per
    * distinct residue). */
  def unknownResidue(raw: String): String = {
    if (raw == null) ""
    else Vocabulary.foldLeft(raw)((rem, t) => rem.replace(t, ""))
  }

  val decodeUdf = udf(decode _)

  def decodeCol(c: Column): Column = decodeUdf(c)
}
