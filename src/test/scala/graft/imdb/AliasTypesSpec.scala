package graft.imdb

import org.scalatest.funsuite.AnyFunSuite

/** F5 vocabulary decode (reference: pimdb/database.py:1003-1029):
  * vocabulary-order matching with substring consumption. */
class AliasTypesSpec extends AnyFunSuite {

  test("empty and null inputs decode to nothing") {
    assert(AliasTypes.decode("") == Seq.empty)
    assert(AliasTypes.decode(null) == Seq.empty)
  }

  test("single tokens decode to themselves") {
    AliasTypes.Vocabulary.foreach { t =>
      assert(AliasTypes.decode(t) == Seq(t))
    }
  }

  test("concatenations decode in vocabulary order, not appearance order") {
    assert(AliasTypes.decode("imdbDisplaydvd") == Seq("dvd", "imdbDisplay"))
    assert(AliasTypes.decode("tvfestival") == Seq("festival", "tv"))
    assert(AliasTypes.decode("workingdvdvideo") == Seq("dvd", "video", "working"))
  }

  test("repeated tokens are consumed and emitted once") {
    assert(AliasTypes.decode("dvddvd") == Seq("dvd"))
  }

  test("unknown residue survives for diagnostics") {
    assert(AliasTypes.unknownResidue("dvdbogus") == "bogus")
    assert(AliasTypes.unknownResidue("dvd") == "")
  }

  test("property: any shuffled distinct-token concatenation decodes to " +
    "exactly those tokens in vocabulary order (500 seeded samples)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val tokens = rnd.shuffle(AliasTypes.Vocabulary
        .filter(_ => rnd.nextBoolean()).toList)
      val decoded = AliasTypes.decode(tokens.mkString)
      assert(decoded == AliasTypes.Vocabulary.filter(tokens.contains),
        s"input=${tokens.mkString}")
    }
  }
}
