package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native BPE merge pass vs the Catalyst fold it replaces: same
  * exact Sennrich left-to-right greedy semantics, pinned three ways —
  * hand-computed adjacency cases (the r18 replace-infidelity
  * regression suite), a randomized sweep against an independent
  * plain-Scala re-derivation of the fold, and a DataFrame-level
  * native-vs-HOF comparison that exercises the codegen path.
  */
class BpeMergeStepSpec extends SparkSpec {

  import spark.implicits._

  private def nat(syms: String, a: String, b: String): String =
    BpeMergeStep.mergeImpl(UTF8String.fromString(syms),
      UTF8String.fromString(a), UTF8String.fromString(b)).toString

  /** The fold semantics, re-derived independently: left-to-right over
    * tokens, glue b onto an accumulator whose trailing token is a.
    * split limit −1 (keep trailing empties) — the Spark HOF fold's
    * split() and DuckDB's string_split both keep them, and the r19
    * native form's limit-0 split was the one engine that didn't. */
  private def ref(syms: String, a: String, b: String): String = {
    val toks = syms.split(" ", -1)
    toks.tail.foldLeft(toks.head) { (acc, t) =>
      if (t == b && (acc == a || acc.endsWith(" " + a))) acc + b
      else acc + " " + t
    }
  }

  test("hand-pinned adjacency cases (the replace path's blind spots)") {
    assert(nat("a a a", "a", "a") == "aa a")
    assert(nat("a b a b", "a", "b") == "ab ab")
    assert(nat("a a a a a a", "a", "a") == "aa aa aa")
    assert(nat("x y z", "a", "b") == "x y z") // fixpoint
    assert(nat("q", "a", "b") == "q") // single symbol
    // a freshly merged token participates only via its FULL form:
    // 'ab' + (b,c) has no bare trailing 'b' to glue onto
    assert(nat("a b c", "b", "c") == "a bc")
    assert(nat("ab c", "b", "c") == "ab c")
    // multi-char symbols from earlier rounds merge like any token
    assert(nat("th e th e", "th", "e") == "the the")
    // multi-byte UTF-8 symbols: the byte walk is codepoint-safe
    // (0x20 never occurs inside a multi-byte sequence)
    assert(nat("é ñ é ñ", "é", "ñ") == "éñ éñ")
    assert(nat("日 本 語", "日", "本") == "日本 語")
  }

  test("degenerate whitespace inputs match the fold (split limit -1 " +
    "semantics: empty tokens are tokens, not dropped or thrown on)") {
    // trailing / leading / doubled spaces — the r19 limit-0 split
    // dropped trailing empties (native ≠ oracle on these inputs)
    Seq("a b ", " a b", "a  b", "a b  ", "  ", " ", "").foreach { syms =>
      Seq(("a", "b"), ("a", ""), ("", "b"), ("", "")).foreach { case (a, b) =>
        assert(nat(syms, a, b) == ref(syms, a, b),
          s"diverged on ('$syms', '$a', '$b')")
      }
    }
    // all-space input no longer throws (r19 form: toks(0) AIOOBE)
    assert(nat("   ", "a", "b") == "   ")
  }

  test("randomized runs agree with the independent fold re-derivation") {
    val rng = new scala.util.Random(19)
    val alphabet = Vector("a", "b", "ab", "c", "aa")
    (0 until 500).foreach { _ =>
      val n = 1 + rng.nextInt(12)
      val syms = Seq.fill(n)(alphabet(rng.nextInt(alphabet.size))).mkString(" ")
      val a = alphabet(rng.nextInt(alphabet.size))
      val b = alphabet(rng.nextInt(alphabet.size))
      assert(nat(syms, a, b) == ref(syms, a, b),
        s"diverged on ('$syms', '$a', '$b')")
    }
  }

  test("DataFrame-level: native expression equals the aggregate HOF " +
    "fold (codegen path exercised)") {
    val rng = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "ab", "c")
    val rows = (0 until 200).map { i =>
      val n = 1 + rng.nextInt(10)
      (i.toLong, Seq.fill(n)(alphabet(rng.nextInt(alphabet.size))).mkString(" "))
    }
    val df = rows.toDF("id", "syms")
    Seq(("a", "b"), ("a", "a"), ("ab", "c")).foreach { case (a, b) =>
      val sy = split(col("syms"), " ")
      val fold =
        aggregate(slice(sy, lit(2), size(sy) - 1), element_at(sy, 1),
          (acc, t) => when(t === lit(b) &&
              (acc === lit(a) || acc.endsWith(lit(" " + a))),
            concat(acc, lit(b))).otherwise(concat(acc, lit(" "), t)))
      val diff = df.select(
        BpeMergeStep(spark, col("syms"), lit(a), lit(b)).as("nat"),
        fold.as("fold"))
        .filter(col("nat") =!= col("fold"))
      assert(diff.count() == 0, s"pair ($a,$b) diverged")
    }
  }
}
