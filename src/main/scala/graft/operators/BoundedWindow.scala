package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window specs for BOUNDED (constant-size) inputs that still need a
  * global rank or total. A truly unpartitioned window is CORRECT
  * there — the input is a post-limit slice, a dictionary, a centroid
  * table or a top-k list, so the single-task funnel is constant
  * work — but `WindowExec` logs a per-execution "No Partition
  * Defined" warning, and a 196-gate sweep turns that into hundreds
  * of identical lines that bury real signals in the bench tail.
  *
  * The constant-literal partition is a structural MARKER, not a
  * physical change: the optimizer's `EliminateWindowPartitions` rule
  * strips foldable partition keys, so the executed plan is exactly
  * the unpartitioned single-partition window it always was — values
  * bit-identical, zero overhead. The marker pays off in the audit:
  * PlanAuditSpec builds gate plans with that one rule excluded, so
  * windows routed through here still carry the literal there and ANY
  * partitionSpec-empty WindowExec is an offender with NO allowlist —
  * a data-sized global window can no longer hide behind a familiar
  * warning name.
  *
  * The warning wall itself (WindowExecBase logs "No Partition
  * Defined" per execution — hundreds of identical lines across a
  * 196-gate sweep) is silenced at OUR entry points by
  * [[quietBoundedWarnings]]: with the audit proving every global
  * window is a justified bounded one, the warning carries no
  * information here and only buries real signals in the bench tail.
  *
  * Only use over inputs already cut to constant size. A corpus-sized
  * input routed through here would funnel through one reducer just
  * like the unpartitioned form — the helper changes auditability and
  * logging, not the physics.
  */
object BoundedWindow {

  /** Fully-qualified name of the optimizer rule that folds the
    * marker away — excluded by PlanAuditSpec while building plans so
    * the audit can tell marked-bounded from genuinely-unpartitioned. */
  val EliminateRule: String =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"

  /** The marker's literal value — DISTINCTIVE on purpose: the audit
    * accepts a foldable partition key only when it is exactly this
    * literal, so an ad-hoc `Window.partitionBy(lit(0))` over a
    * data-sized input cannot slip past as if it were a reviewed
    * BoundedWindow call site (writing lit(0x60D) by hand is the same
    * deliberate act as editing an allowlist — visible in review). */
  val MarkerValue: Int = 0x60D

  /** Globally ordered window over a bounded input (ranks). */
  def orderBy(cols: Column*): WindowSpec =
    Window.partitionBy(lit(MarkerValue)).orderBy(cols: _*)

  /** Whole-input window over a bounded input (totals/shares). */
  def all: WindowSpec = Window.partitionBy(lit(MarkerValue))

  /** Silence WindowExec's per-execution "No Partition Defined"
    * warning for this JVM. Justified ONLY because PlanAuditSpec
    * proves (allowlist-free) that every unpartitioned window in the
    * registry is a BoundedWindow marker over constant-size input —
    * the warning would warn about nothing, hundreds of times per
    * sweep. Scoped to the window-exec package; every other Spark
    * warning still prints.
    *
    * Scope trade-off, stated plainly: the logger level is
    * JVM-GLOBAL, so in the processes that call this (Bench, Verify,
    * the test JVM via SparkSpec — nothing in src/main calls it at
    * import time, so library users' sessions are untouched) the
    * warning is also lost for code the audit does NOT plan — a
    * future non-registry pipeline or spec-only path that grows a
    * data-sized global window would run silently single-task in
    * those JVMs. The compensating control is the convention this
    * object exists for: every global window in src/main goes through
    * [[orderBy]]/[[all]], and PlanAuditSpec flags any registry plan
    * that didn't. Code outside the registry forfeits the runtime
    * warning in our harness JVMs — route it through here too. */
  def quietBoundedWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
