package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The forked-JVM phase bodies for [[DurabilitySpec]] — each `main`
  * invocation is one complete process lifetime: build a SparkSession
  * against the shared state directory, run the phase's work and
  * assertions, print the completion marker, exit. Nothing but the
  * metastore/warehouse directories carries over between phases; that
  * is the point. */
object DurabilityPhases {

  private val Table = "durability_state"
  private val DropTable = "durability_dropme"
  private val Neighbor = s"${DropTable}__video" // prefix-colliding
  private val Buckets = 2

  private def hiveSession(stateDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-durability")
      // a REAL persistent catalog: Hive metastore over embedded
      // Derby, files under the shared warehouse dir — the durable
      // half of the deployment every phase reconnects to
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$stateDir/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$stateDir/metastore_db;create=true")
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def memorySession(stateDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-durability-ephemeral")
      // in-memory catalog + the SAME warehouse dir: every process
      // starts with an empty catalog over yesterday's files
      .config("spark.sql.catalogImplementation", "in-memory")
      .config("spark.sql.warehouse.dir", s"$stateDir/warehouse")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def df(spark: SparkSession, b: Long): DataFrame = {
    import spark.implicits._
    (0L until 8L).map(i => (i % 2, b)).toDF("a", "b")
  }

  private def bValues(spark: SparkSession, table: String): Set[Long] =
    spark.table(table).select(col("b")).distinct()
      .collect().map(_.getLong(0)).toSet

  def main(args: Array[String]): Unit = {
    val Array(phase, stateDir) = args
    val spark = phase match {
      case p if p.startsWith("hive-") => hiveSession(stateDir)
      case _ => memorySession(stateDir)
    }
    spark.sparkContext.setLogLevel("WARN")
    try {
      phase match {
        case "hive-seed" =>
          // two committed swaps + an append: v1(b=1), v2(b=2, +b=9)
          Sources.swapBucketed(df(spark, 1L), Table, Seq("a"), Buckets)
          Sources.swapBucketed(df(spark, 2L), Table, Seq("a"), Buckets)
          val appended = Sources.appendBucketed(
            df(spark, 9L).limit(4), Table, Seq("a"), Buckets)
          require(appended == 4L, s"append observed $appended rows, not 4")
          require(Sources.currentVersion(spark, Table).contains(2))

        case "hive-inspect-crash" =>
          // a genuinely fresh process: the catalog is all it has
          require(spark.catalog.tableExists(Table),
            "fresh JVM cannot see the pointer view — durable catalog " +
              "resolution is broken")
          require(Sources.currentVersion(spark, Table).contains(2),
            s"pointer resolves to ${Sources.currentVersion(spark, Table)}" +
              ", expected 2")
          val served = bValues(spark, Table)
          require(served == Set(2L, 9L),
            s"v2 must serve the swap AND the append across the restart; " +
              s"got $served")
          require(spark.table(Table).count() == 12L,
            "restarted reader lost rows")
          val asOf = Sources.readVersion(spark, Table, 1)
          require(asOf.count() == 8L &&
            asOf.select(col("b")).distinct().collect()
              .map(_.getLong(0)).toSet == Set(1L),
            "as-of read of v1 diverged across the restart")
          // simulate the swap crash: materialize __v3 completely,
          // die before the pointer flip
          Sources.writeBucketed(
            df(spark, 999L).repartition(Buckets, col("a")),
            s"${Table}__v3", Seq("a"), Buckets)

        case "hive-recover" =>
          // the orphan from the crashed swap must be INVISIBLE
          require(Sources.currentVersion(spark, Table).contains(2),
            "a crashed swap moved the pointer")
          require(bValues(spark, Table) == Set(2L, 9L),
            "orphan rows surfaced through the pointer after restart")
          // recovery = re-derive from committed state; swapBucketed
          // reclaims the orphan __v3 and writes the real v3
          Sources.swapBucketed(
            spark.table(Table).select(col("a"),
              (col("b") + 100L).as("b")),
            Table, Seq("a"), Buckets)
          require(Sources.currentVersion(spark, Table).contains(3),
            "recovery swap did not continue the version chain at v3")
          val now = bValues(spark, Table)
          require(now == Set(102L, 109L),
            s"recovery must derive from the committed v2; got $now")
          // retention still serves the PRIOR committed version as-of
          require(bValues(spark, s"${Table}__v2") == Set(2L, 9L),
            "as-of v2 lost after the recovery swap")
          Sources.dropVersioned(spark, Table)

        case "hive-append-crash" =>
          // simulate appendBucketed's CREATE dying between its
          // saveAsTable(__v1) and the pointer flip, with a real dead
          // JVM: in-flight marker + complete version, no pointer —
          // the persistent catalog REMEMBERS the orphan, which is
          // exactly when the marker-gated decision matters
          val t = "durability_append"
          val marker = new org.apache.hadoop.fs.Path(
            spark.sessionState.catalog.defaultTablePath(
              org.apache.spark.sql.catalyst.TableIdentifier(t))
              .toString + "._append_creating")
          marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .create(marker, true).close()
          Sources.writeBucketed(
            df(spark, 666L).repartition(Buckets, col("a")),
            s"${t}__v1", Seq("a"), Buckets)
          require(Sources.currentVersion(spark, t).isEmpty)

        case "hive-append-recover" =>
          // the restarted ingest's first trigger re-delivers the
          // batch; the marker proves the orphan is our own crashed
          // create, so the append self-heals with NO operator action
          val t = "durability_append"
          require(Sources.currentVersion(spark, t).isEmpty,
            "precondition: crashed create left no pointer")
          Sources.appendBucketed(df(spark, 7L).limit(4), t,
            Seq("a"), Buckets)
          require(Sources.currentVersion(spark, t).contains(1),
            "self-healed create must commit the pointer")
          require(bValues(spark, t) == Set(7L),
            "the crashed create's rows must be reclaimed, not merged")
          require(spark.table(t).count() == 4L)
          Sources.dropVersioned(spark, t)

        case "dead-seed" =>
          // versioned tables + a prefix-colliding neighbor, then the
          // process dies and takes the in-memory catalog with it
          Sources.swapBucketed(df(spark, 1L), Table, Seq("a"), Buckets)
          Sources.swapBucketed(df(spark, 1L), DropTable, Seq("a"), Buckets)
          Sources.swapBucketed(df(spark, 2L), DropTable, Seq("a"), Buckets)
          Sources.writeBucketed(df(spark, 5L), Neighbor, Seq("a"), Buckets)

        case "dead-sweep" =>
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          def loc(t: String) = new org.apache.hadoop.fs.Path(
            spark.sessionState.catalog.defaultTablePath(
              org.apache.spark.sql.catalyst.TableIdentifier(t)))
          require(!spark.catalog.tableExists(Table) &&
            fs.exists(loc(s"${Table}__v1")),
            "precondition: catalog forgot the table but files persist")
          // appendBucketed's CREATE path: the catalog lists no orphan
          // versions (it lost them with the dead JVM), so the loud
          // refusal does not fire; the dead v1 FILES must be swept or
          // saveAsTable dies with LOCATION_ALREADY_EXISTS
          Sources.appendBucketed(df(spark, 7L), Table, Seq("a"), Buckets)
          require(bValues(spark, Table) == Set(7L),
            "re-created table must serve ONLY the new rows — the dead " +
              "session's rows belong to a run the catalog never " +
              "committed")
          // dropVersioned's glob sweep: version dirs the catalog no
          // longer knows must go; the prefix-colliding neighbor's
          // files must SURVIVE (exact __v<digits> matching)
          require(fs.exists(loc(s"${DropTable}__v1")) &&
            fs.exists(loc(s"${DropTable}__v2")),
            "precondition: dead version dirs persist")
          Sources.dropVersioned(spark, DropTable)
          require(!fs.exists(loc(s"${DropTable}__v1")) &&
            !fs.exists(loc(s"${DropTable}__v2")),
            "catalog-lost version dirs must be swept")
          require(fs.exists(loc(Neighbor)),
            "prefix-colliding neighbor files must survive the sweep")
          // and the swept name is immediately reusable
          Sources.swapBucketed(df(spark, 3L), DropTable, Seq("a"), Buckets)
          require(bValues(spark, DropTable) == Set(3L))

        case other => sys.error(s"unknown phase: $other")
      }
      println(s"[phase $phase] OK")
    } finally spark.stop()
  }
}
