package graft.imdb

import org.apache.spark.sql.SparkSession

/** CLI with the reference's verbs (reference: pimdb/command.py):
  *
  * {{{
  *   graft.imdb.Main transfer <dataFolder> [warehouse] [dataset...]
  *   graft.imdb.Main build    <dataFolder> [warehouse]
  *   graft.imdb.Main query    <dataFolder> <sql-or-@file>
  * }}}
  *
  * `download` is deliberately out of engine scope (a driver-side HTTP
  * fetch in the reference, common.py:155-180; this environment has no
  * egress) — `transfer` consumes already-downloaded .tsv[.gz] files.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { usage(); sys.exit(2) }
    val verb = args(0)
    val dataFolder = args(1)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("pimdbspark")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pimdb = Pimdb(spark)
    try verb match {
      case "transfer" =>
        val warehouse = args.lift(2)
        val names = args.drop(3)
        val datasets =
          if (names.isEmpty || names.contains("all")) ImdbDataset.all
          else if (names.contains("normalized")) ImdbDataset.forNormalized
          else names.map(ImdbDataset.byName).toSeq
        pimdb.transfer(dataFolder, datasets, warehouse)
      case "build" =>
        pimdb.transfer(dataFolder, ImdbDataset.all, args.lift(2))
        pimdb.build(args.lift(2))
      case "query" =>
        val sqlArg = args(2)
        val sql =
          if (sqlArg.startsWith("@"))
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(sqlArg.drop(1))), "UTF-8")
          else sqlArg
        pimdb.transfer(dataFolder, ImdbDataset.all, None)
        pimdb.build(None)
        val out = new java.io.PrintWriter(System.out)
        pimdb.queryToTsv(sql, out)
      case other =>
        System.err.println(s"unknown command: $other"); usage(); sys.exit(2)
    } finally spark.stop()
  }

  private def usage(): Unit = System.err.println(
    """usage: transfer <dataFolder> [warehouse] [dataset...|all|normalized]
      |       build    <dataFolder> [warehouse]
      |       query    <dataFolder> <sql | @file.sql>""".stripMargin)
}
