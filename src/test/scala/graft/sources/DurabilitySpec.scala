package graft.sources

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-JVM durability of the versioned-table machinery — the real
  * restart story, not a simulation: every phase below runs in its own
  * forked JVM with its own SparkSession, sharing only what a
  * production deployment shares (a persistent metastore + warehouse
  * directory, or just a warehouse directory for the ephemeral-catalog
  * case). The in-JVM SourcesSpec coverage (newSession over a shared
  * in-memory catalog, hand-planted "dead" files) exercises the same
  * code paths but cannot prove that recovery survives an actual
  * process boundary; this spec does.
  *
  * Scenario A (persistent Hive/Derby metastore — the durable-catalog
  * deployment):
  *   1. seed: swap v1, swap v2, append into v2 — then the JVM exits.
  *   2. inspect+crash: a genuinely fresh JVM resolves the pointer to
  *      v2 WITH the appended rows, reads v1 as-of, then simulates a
  *      swap crash by writing a complete-but-unflipped __v3 and
  *      dying.
  *   3. recover: a third JVM still serves v2 (the orphan stayed
  *      invisible), re-derives the next version FROM the committed
  *      state (reclaiming the orphan), and the chain continues at
  *      v3 with v2 readable as-of.
  *   4. append-crash / 5. append-recover: appendBucketed's OWN crash
  *      window (in-flight creation marker + complete __v1, no
  *      pointer) left by a dead JVM self-heals on the next JVM's
  *      append — the persistent catalog remembers the orphan, the
  *      marker proves it discardable, the re-delivered batch lands
  *      alone.
  *
  * Scenario B (ephemeral in-memory catalog + persistent warehouse
  * dir — the re-run-an-index-job deployment, where the catalog
  * forgets everything between runs but files persist):
  *   1. seed: create a versioned table (v1+pointer) and a versioned
  *      table for dropping, plus a prefix-colliding NEIGHBOR table —
  *      exit, losing the catalog.
  *   2. sweep: the fresh JVM's appendBucketed(create) must sweep the
  *      dead v1 files (or saveAsTable dies with
  *      LOCATION_ALREADY_EXISTS) and serve ONLY the new rows;
  *      dropVersioned must glob-sweep the other table's catalog-lost
  *      version dirs while the neighbor's files survive.
  *
  * Phase assertions run inside the forked JVMs (a failure is a
  * non-zero exit, surfaced with the subprocess log); the host spec
  * only orchestrates. */
class DurabilitySpec extends AnyFunSuite {

  // mirror of build.sbt's jdk17AddOpens — a forked SparkSession on
  // JDK 17 outside spark-submit needs the module opens itself
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runPhase(phase: String, stateDir: Path): Unit = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx3g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dderby.system.home=$stateDir/derby_$phase",
      "-cp", System.getProperty("java.class.path"),
      "graft.sources.DurabilityPhases", phase, stateDir.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0,
      s"phase '$phase' failed (exit $code); subprocess log:\n" +
        out.linesIterator.toSeq.takeRight(60).mkString("\n"))
    assert(out.contains(s"[phase $phase] OK"),
      s"phase '$phase' exited 0 without its completion marker:\n" +
        out.linesIterator.toSeq.takeRight(30).mkString("\n"))
  }

  test("versioned tables survive real process restarts against a " +
    "persistent Derby metastore: pointer resolution, as-of reads, " +
    "orphan invisibility + reclamation, and chain continuation") {
    val dir = Files.createTempDirectory("graft_durability_hive")
    runPhase("hive-seed", dir)
    runPhase("hive-inspect-crash", dir)
    runPhase("hive-recover", dir)
    // and appendBucketed's own crash window, where the PERSISTENT
    // catalog remembers the orphan: the creation marker must let the
    // restarted ingest self-heal with no operator action
    runPhase("hive-append-crash", dir)
    runPhase("hive-append-recover", dir)
  }

  test("ephemeral-catalog re-runs against a persistent warehouse: the " +
    "fresh JVM's create sweeps dead version files, dropVersioned " +
    "glob-sweeps catalog-lost versions, neighbors survive") {
    val dir = Files.createTempDirectory("graft_durability_dead")
    runPhase("dead-seed", dir)
    runPhase("dead-sweep", dir)
  }
}
