package graft.imdb

import graft.SparkSpec

/** The BuildBench generator must feed the PRODUCTION transfer+build
  * pipeline losslessly at any scale — otherwise its ~1 GB timing
  * artifact measures a partially-dropped corpus. Run the whole thing
  * at a small scale and pin the invariants that make the timing
  * honest: every generated row survives transfer (no dedup-key
  * collisions), every cross-reference resolves (no dangling
  * tconst/nconst silently dropped by build's inner joins), and the
  * built corpus passes the reference's own validation cleanly. */
class BuildBenchSpec extends SparkSpec {

  test("synthetic TSV set drives transfer+build losslessly: counts " +
    "match the generator's row map, references all resolve, zero " +
    "duplicates, no validation warnings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buildbench")
    val rows = BuildBench.generate(spark, dir, titles = 2000)
    val p = Pimdb(spark)
    p.transfer(dir.toString)
    p.build()

    assert(p.buildWarnings.isEmpty,
      s"build validation must be clean: ${p.buildWarnings.mkString("; ")}")
    assert(p.transferDuplicateCounts.values.forall(_ == 0L),
      "generated keys must be duplicate-free (a collision would make " +
        s"the timed corpus smaller than reported): " +
        p.transferDuplicateCounts.toString)

    // transfer serves exactly the generated row counts
    rows.foreach { case (name, n) =>
      val table = ImdbDataset.camelizedDotName(name)
      assert(spark.table(table).count() == n,
        s"$table lost rows in transfer")
    }

    // build's inner joins drop NOTHING: every generated reference
    // resolves (episodes' tconst/parentTconst are titles, principals'
    // nconst/tconst exist), so normalized counts equal dataset counts
    assert(spark.table("title").count() == rows("title.basics"))
    assert(spark.table("name").count() == rows("name.basics"))
    assert(spark.table("title_alias").count() == rows("title.akas"))
    assert(spark.table("episode").count() == rows("title.episode"),
      "a dangling parentTconst would shrink episode here")
    assert(spark.table("participation").count() ==
      rows("title.principals"),
      "a dangling principal reference would shrink participation here")
    // and the list-valued columns genuinely exploded into join tables
    assert(spark.table("title_to_genre").count() > 0)
    assert(spark.table("name_to_known_for_title").count() > 0)
    assert(spark.table("participation_to_character").count() > 0)
  }
}
