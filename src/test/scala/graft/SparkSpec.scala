package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one JVM-wide SparkSession across suites. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft_derby").toString)
    val s = GraftSession.shared(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the real spark.sql.extensions wiring: the test context is
      // created fresh with this conf, exactly like a cluster deploy —
      // GraftExtensionsSpec asserts the injected surface works
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.operators.BoundedWindow.quietBoundedWarnings()
    s
  }
}
