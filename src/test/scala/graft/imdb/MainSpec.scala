package graft.imdb

import graft.SparkSpec

/** CLI exit-code parity with the reference (tests/test_command.py):
  * --help/--version exit 0, usage errors exit 2, runtime errors exit
  * 1, happy paths exit 0. `exitCodeFor` mirrors command.py's
  * `exit_code_for`, so codes are asserted without exiting the JVM. */
class MainSpec extends SparkSpec {

  private lazy val dataDir = getClass.getResource("/imdb").getPath

  private def code(args: String*): Int = Main.exitCodeFor(args, spark)

  test("--help and per-command --help exit 0 (test_command.py:12-22)") {
    assert(code("--help") == 0)
    Seq("download", "transfer", "build", "query").foreach { c =>
      assert(code(c, "--help") == 0, c)
    }
  }

  test("--version exits 0 (test_command.py:25-28)") {
    assert(code("--version") == 0)
  }

  test("no command is a usage error, exit 2 (test_command.py:59-62)") {
    assert(code() == 2)
    assert(code("frobnicate", dataDir) == 2)
  }

  test("--bulk 0 is a usage error, exit 2 (test_command.py:53-56)") {
    assert(code("transfer", dataDir, "title.ratings", "--bulk", "0") == 2)
    assert(code("transfer", dataDir, "--bulk", "nope") == 2)
  }

  test("'all' mixed with other names is a usage error (command.py:167-169)") {
    assert(code("transfer", dataDir, "all", "title.ratings") == 2)
    assert(code("transfer", dataDir, "normalized", "all") == 2)
    assert(code("transfer", dataDir, "no.such.dataset") == 2)
  }

  test("flags are validated per command like argparse subparsers " +
    "(command.py:38-140): out-of-place flags exit 2") {
    // query does not define the load flags
    assert(code("query", dataDir, "select 1", "--drop") == 2)
    assert(code("query", dataDir, "select 1", "--bulk", "5") == 2)
    // transfer/build do not define --file
    assert(code("transfer", dataDir, "title.ratings", "--file") == 2)
    // flags (other than --help/--version) before COMMAND are top-level
    // unrecognized arguments
    assert(code("--drop", "transfer", dataDir) == 2)
    // --version lives on the root parser only
    assert(code("transfer", dataDir, "--version") == 2)
  }

  test("a flag needing a value does not swallow flag-shaped tokens " +
    "(argparse 'expected one argument')") {
    assert(code("transfer", dataDir, "--database") == 2)
    assert(code("transfer", dataDir, "--bulk", "--drop") == 2)
    // ...and --help is still honored when it is NOT a flag's value
    assert(code("transfer", "--help") == 0)
  }

  test("runtime failure (missing folder) exits 1, not a crash") {
    assert(code("transfer", "/no/such/folder", "title.ratings") == 1)
  }

  test("transfer + query happy paths exit 0 (test_command.py:32-50)") {
    assert(code("transfer", dataDir, "title.ratings") == 0)
    assert(spark.table("TitleRatings").count() == 12)
    assert(code("query", dataDir, "select count(1) as c from title") == 0)
  }

  test("--log is a root-parser option with the reference's choices " +
    "(command.py:19-20, 92-100)") {
    // valid levels parse and the command still runs
    assert(code("--log", "warning", "transfer", dataDir, "title.ratings") == 0)
    assert(code("--log", "debug", "--version") == 0)
    // invalid choice is a usage error like argparse
    assert(code("--log", "nope", "transfer", dataDir) == 2)
    // value slot: --log cannot swallow a flag-shaped token
    assert(code("--log", "--version") == 2)
    // root-only: after the COMMAND it is an unknown sub-parser flag
    assert(code("transfer", dataDir, "--log", "debug") == 2)
  }

  test("--dataset-folder/-f supplies the folder and leaves positionals " +
    "as NAMEs (command.py:61-67)") {
    assert(code("transfer", "--dataset-folder", dataDir, "title.ratings") == 0)
    assert(code("transfer", "-f", dataDir, "title.ratings") == 0)
    assert(spark.table("TitleRatings").count() == 12)
    // the flag takes a value: a following flag token is a usage error
    assert(code("transfer", "--dataset-folder") == 2)
    // build keeps the positional-folder form only (reference build has
    // no dataset folder — command.py:124-129)
    assert(code("build", "--dataset-folder", dataDir) == 2)
  }

  test("a first positional that IS a dataset name means the folder " +
    "defaulted to the current dir (reference default='')") {
    // ./title.ratings.tsv.gz does not exist → runtime error (1), NOT
    // the usage error (2) a missing-folder parse would produce
    assert(code("transfer", "title.ratings") == 1)
  }

  test("on query, -f is short for --file (command.py:135), not the folder") {
    import java.nio.file.Files
    val f = Files.createTempFile("graft_q", ".sql")
    Files.write(f, "select count(1) as c from title".getBytes)
    assert(code("query", dataDir, f.toString, "-f") == 0)
    assert(code("query", dataDir, f.toString, "--file") == 0)
  }

  test("download from a file:// mirror: cache miss copies, cache hit skips, " +
    "--force refetches (reference command.py:153-162, common.py:155-180)") {
    import java.nio.file.{Files, Paths}
    val mirror = Files.createTempDirectory("graft_mirror")
    val out = Files.createTempDirectory("graft_dl")
    val name = ImdbDataset.TitleRatings.fileName
    Files.write(mirror.resolve(name), "v1".getBytes)

    // miss: copies the file and records its Last-Modified in the cache
    assert(code("download", out.toString, "title.ratings",
      "--url", mirror.toUri.toString) == 0)
    assert(Files.readString(out.resolve(name)) == "v1")
    assert(Files.exists(out.resolve(".last_modified.json")))

    // hit: mirror unchanged → the 304 path, target NOT rewritten
    // (poke the target so a rewrite would be visible)
    Files.write(out.resolve(name), "poked".getBytes)
    assert(code("download", out.toString, "title.ratings",
      "--url", mirror.toUri.toString) == 0)
    assert(Files.readString(out.resolve(name)) == "poked")

    // --force: unconditional refetch overwrites the poke
    assert(code("download", out.toString, "title.ratings", "--force",
      "--url", mirror.toUri.toString) == 0)
    assert(Files.readString(out.resolve(name)) == "v1")

    // a plain folder path works as a mirror base too
    val out2 = Files.createTempDirectory("graft_dl2")
    assert(code("download", out2.toString, "title.ratings",
      "--url", mirror.toString) == 0)
    assert(Files.readString(out2.resolve(name)) == "v1")

    // missing mirror file = runtime failure (exit 1, the HTTP-error analog)
    assert(code("download", out.toString, "name.basics",
      "--url", mirror.toUri.toString) == 1)
    // download's flags stay scoped to download (argparse-subparser parity)
    assert(code("transfer", dataDir, "title.ratings", "--force") == 2)
    assert(code("download", out.toString, "all", "--bulk", "5") == 2)
  }
}
