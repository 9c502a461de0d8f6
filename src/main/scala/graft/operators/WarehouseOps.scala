package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators a continuously-refreshed corpus
  * needs around the analytics surface: CDC upsert/delete merge of a
  * change batch into a base snapshot, and slowly-changing-dimension
  * (type 2) history derivation from an event stream.
  *
  * The reference rebuilds its tables wholesale per transfer
  * (database.py's drop-and-recreate build); at 100 TB a corpus
  * refresh is incremental — a crawl delta lands as a change batch and
  * is MERGEd into the standing snapshot, and slowly-changing
  * attributes keep their full validity history rather than being
  * overwritten. Both ops are single-shuffle:
  *
  *  - [[mergeUpsert]] is ONE full-outer equi-join on the snapshot
  *    key. In production the base side is the bucketed layout
  *    (`Sources.writeBucketed`/`compactBucketed`), so the join
  *    shuffles only the (much smaller) change batch — the same
  *    exchange-free-stored-side shape as the ANN/band index probes.
  *    Text never shuffles: verdicts carry content hashes.
  *  - [[scd2History]] is ONE user_id shuffle; every window
  *    (change-detection lag, running version sum, validity lead)
  *    reuses that single partitioning, and rows shrink to
  *    (user, attr, ts) before the exchange.
  */
object WarehouseOps {

  /** ONE oracle for q_merge_upsert AND q_stream_merge: the batch
    * full-outer formulation both the single-shot merge and the
    * per-trigger streaming CDC fold must reproduce — sharing the
    * string makes batch/stream agreement structural. */
  private[operators] val mergeSql: String =
    """WITH ch AS (
      |  SELECT doc_id, text || ' [rev2]' AS new_text, 'update' AS op
      |  FROM documents WHERE doc_id % 10 IN (0, 1)
      |  UNION ALL
      |  SELECT doc_id, NULL, 'delete' FROM documents WHERE doc_id % 10 = 2
      |  UNION ALL
      |  SELECT -doc_id - 1, 'ins ' || text, 'insert'
      |  FROM documents WHERE doc_id % 10 = 3)
      |SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
      |       coalesce(c.op, 'keep') AS op,
      |       md5(coalesce(c.new_text, b.text)) AS content_hash,
      |       CAST(len(coalesce(c.new_text, b.text)) AS BIGINT) AS n_chars
      |FROM documents b FULL OUTER JOIN ch c ON b.doc_id = c.doc_id
      |WHERE c.op IS NULL OR c.op <> 'delete'""".stripMargin

  /** ONE oracle for q_scd2_history AND q_stream_scd2 — the batch
    * window formulation the stateful stream must reproduce row for
    * row. */
  private[operators] val scd2Sql: String =
    """WITH o AS (SELECT user_id, event_type AS attr, epoch_us(ts) AS ts_us,
      |                  event_id
      |           FROM events),
      |g AS (SELECT user_id, attr, ts_us, event_id,
      |             CASE WHEN lag(attr) OVER (PARTITION BY user_id
      |                                       ORDER BY ts_us, event_id) IS NULL
      |                    OR lag(attr) OVER (PARTITION BY user_id
      |                                       ORDER BY ts_us, event_id) <> attr
      |                  THEN 1 ELSE 0 END AS chg
      |      FROM o),
      |f AS (SELECT user_id, attr, ts_us, chg,
      |             CAST(sum(chg)
      |                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |      FROM g),
      |s AS (SELECT user_id, attr, version, ts_us AS valid_from_us
      |      FROM f WHERE chg = 1)
      |SELECT user_id, attr, version, valid_from_us,
      |       lead(valid_from_us) OVER (PARTITION BY user_id
      |                                 ORDER BY version) AS valid_to_us,
      |       lead(valid_from_us) OVER (PARTITION BY user_id
      |                                 ORDER BY version) IS NULL AS is_current
      |FROM s""".stripMargin

  /** The deterministic gate change batch both merge gates derive from
    * the documents table — (doc_id, new_payload, op). Insert keys are
    * `-doc_id - 1`: base doc_ids are non-negative at every scale
    * factor, so the negated key space cannot collide with an existing
    * base row no matter how large the corpus grows (a fixed positive
    * offset would silently turn inserts into overwrites past that
    * many rows, mislabeling the provenance ledger). */
  private[operators] def gateChanges(docs: DataFrame): DataFrame = {
    val updates = docs.filter(col("doc_id") % 10 <= 1)
      .select(col("doc_id"),
        concat(col("text"), lit(" [rev2]")).as("new_payload"),
        lit("update").as("op"))
    val deletes = docs.filter(col("doc_id") % 10 === 2)
      .select(col("doc_id"), lit(null).cast("string").as("new_payload"),
        lit("delete").as("op"))
    val inserts = docs.filter(col("doc_id") % 10 === 3)
      .select((-col("doc_id") - 1L).as("doc_id"),
        concat(lit("ins "), col("text")).as("new_payload"),
        lit("insert").as("op"))
    updates.union(deletes).union(inserts)
  }

  /** Apply a CDC change batch (op ∈ insert/update/delete) to a base
    * snapshot keyed by `keyCol`. Update rows replace `payloadCol`,
    * delete rows drop the key, insert rows add it; untouched base
    * rows pass through with op='keep'. Returns the merged snapshot
    * with per-row provenance.
    *
    * Change-batch schema is FIXED, not parameterized: `changes` must
    * carry (`keyCol`, `new_payload`, `op`) — the payload column is
    * named `new_payload` regardless of `payloadCol`, which names only
    * the BASE side's column (CDC feeds conventionally distinguish the
    * incoming image from the stored one; see [[gateChanges]] for the
    * shape). A mismatched batch fails analysis loudly, not silently.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
      payloadCol: String): DataFrame = {
    val b = base.select(col(keyCol), col(payloadCol).as("base_payload"))
    val c = changes.select(col(keyCol), col("new_payload"), col("op"))
    b.join(c, Seq(keyCol), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(
        col(keyCol),
        coalesce(col("op"), lit("keep")).as("op"),
        coalesce(col("new_payload"), col("base_payload")).as("payload"))
  }

  /** SCD type-2 attribute history from an ordered per-key event
    * stream: collapse consecutive runs of the same attribute value
    * into versions with [valid_from, valid_to) validity and an
    * is_current flag. Total order inside a key is (ts, tieCol) so
    * same-timestamp events cannot reorder between engines.
    */
  def scd2History(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val starts = events
      .withColumn("prev", lag(col(attrCol), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col(attrCol), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("chg") === 1)
      .select(col(keyCol), col(attrCol).as("attr"),
        col("version").cast("long").as("version"),
        col(tsCol).as("valid_from_us"))
    starts
      .withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(
          Window.partitionBy(col(keyCol)).orderBy(col("version"))))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** One streaming-CDC fold round: apply a change micro-batch to a
    * PROVENANCE-carrying snapshot (key, op, payload) — the per-trigger
    * statement of a foreachBatch CDC apply. Unlike [[mergeUpsert]]
    * (whose base has no op column), the fold keeps the op a key
    * acquired in an EARLIER trigger when a later trigger leaves it
    * untouched, so the final snapshot's ledger equals the single-shot
    * batch merge whatever the batch slicing — provided each key
    * changes at most once across the stream, the CDC-compacted
    * change-log contract. */
  def mergeApplyCdc(snapshot: DataFrame, batch: DataFrame): DataFrame =
    snapshot.join(
      batch.select(col("doc_id"), col("new_payload"), col("op").as("c_op")),
      Seq("doc_id"), "full_outer")
      .filter(col("c_op").isNull || col("c_op") =!= "delete")
      .select(col("doc_id"),
        coalesce(col("c_op"), col("op")).as("op"),
        coalesce(col("new_payload"), col("payload")).as("payload"))

  val all: Seq[QueryDef] = Seq(

    // CDC MERGE: a deterministic change batch derived from the corpus
    // (doc_id % 10 ∈ {0,1} → update with a revision suffix, = 2 →
    // delete, = 3 → insert under a shifted key) applied to the
    // documents snapshot in one full-outer equi-join. The gate output
    // is the merged snapshot's provenance ledger — (key, op,
    // content_hash, n_chars) — so text itself never leaves the scan.
    // At 100 TB the base side is the bucketed stored snapshot and
    // only the change batch moves; the same statement shape is what a
    // foreachBatch streaming CDC apply runs per trigger.
    QueryDef.sql("q_merge_upsert", mergeSql) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      mergeUpsert(docs, gateChanges(docs), "doc_id", "text")
        .select(col("doc_id"), col("op"),
          md5(col("payload").cast("binary")).as("content_hash"),
          length(col("payload")).cast("long").as("n_chars"))
    },

    // SCD type-2 history over the event stream: each user's
    // event_type sequence (ordered by ts then event_id) collapses
    // into attribute versions with [valid_from, valid_to) validity —
    // the dimension-table shape a warehouse keeps instead of
    // overwriting the current value. One user_id shuffle; the rows
    // entering it are (user, attr, ts_us, event_id) — never props.
    // Point-in-time dimension lookup — SCD2's purpose: every event
    // joined to the attribute version VALID AT its timestamp
    // (valid_from <= ts < valid_to, open version catches the tail).
    // A change event lands in the version it OPENS (its ts is the new
    // valid_from and the old valid_to — half-open on both engines).
    // The join is equi on the dimension key plus a range predicate,
    // so it plans as a hash join + filter; at 100 TB both sides
    // co-partition on the key (the dimension side is version-list
    // sized, not event-sized). This is the history-correct
    // training-data join a temporal feature store runs instead of
    // leaking TODAY's attribute onto YESTERDAY's example.
    QueryDef.sql(
      "q_scd2_point_in_time",
      s"""WITH v AS (
         |$scd2Sql
         |)
         |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         |       v.attr, v.version
         |FROM events e JOIN v ON e.user_id = v.user_id
         |  AND epoch_us(e.ts) >= v.valid_from_us
         |  AND (v.valid_to_us IS NULL OR epoch_us(e.ts) < v.valid_to_us)""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val v = scd2History(
          ev.select(col("user_id"), col("event_type"), col("ts_us"),
            col("event_id")),
          "user_id", "event_type", "ts_us", "event_id")
          .select(col("user_id").as("v_user"), col("attr"), col("version"),
            col("valid_from_us"), col("valid_to_us"))
        ev.join(v,
          col("user_id") === col("v_user") &&
            col("ts_us") >= col("valid_from_us") &&
            (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("attr"), col("version"))
    },

    QueryDef.sql("q_scd2_history", scd2Sql) { (s, dir) =>
      scd2History(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_us"),
            col("event_id")),
        "user_id", "event_type", "ts_us", "event_id")
        .select(col("user_id"), col("attr"), col("version"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
    })
}
