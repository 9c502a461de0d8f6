package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseOpsSpec extends SparkSpec {

  import spark.implicits._

  test("observe() collects in-flight data-quality metrics during the " +
    "job itself — no second pass over the corpus") {
    // the production-observability contract: a pipeline's row counts /
    // null rates / mass totals ride along inside the SAME job via the
    // CollectMetrics node, instead of a second full scan per metric —
    // at 100 TB the difference between free counters and doubling IO
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val observed = docs
      .observe("ingest_quality",
        count(lit(1)).as("n_rows"),
        count(col("text")).as("n_text_notnull"),
        sum(length(col("text"))).as("char_mass"))
      .filter(col("lang") === "en")
    // the action must drive THIS frame's QueryExecution — count()
    // would execute its own aggregate plan whose metrics this frame
    // never sees (the codegen-audit lesson)
    val kept = observed.collect().length
    val metrics = observed.queryExecution.observedMetrics("ingest_quality")
    val exact = docs.agg(count(lit(1)), count(col("text")),
      sum(length(col("text")))).head()
    assert(metrics.getLong(0) == exact.getLong(0) &&
      metrics.getLong(1) == exact.getLong(1) &&
      metrics.getLong(2) == exact.getLong(2),
      s"observed metrics diverge from a dedicated pass: $metrics vs $exact")
    assert(kept > 0 && kept < metrics.getLong(0),
      "filter should keep a strict subset — metrics cover PRE-filter rows")
  }

  test("merge upsert: updates overwrite, deletes drop, inserts add, " +
    "untouched rows pass through as keep") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, Option("two v2"), "update"),
      (3L, Option.empty[String], "delete"),
      (9L, Option("nine"), "insert"))
      .toDF("doc_id", "new_payload", "op")
    val out = WarehouseOps.mergeUpsert(base, changes, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(out == Set(
      (1L, "keep", "one"),
      (2L, "update", "two v2"),
      (4L, "keep", "four"),
      (9L, "insert", "nine")))
  }

  test("CDC fold: per-trigger applies preserve earlier-trigger " +
    "provenance and reach the single-shot merge result") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val snap0 = base.select(col("doc_id"), lit("keep").as("op"),
      col("text").as("payload"))
    val b1 = Seq((2L, Option("two v2"), "update"))
      .toDF("doc_id", "new_payload", "op")
    val b2 = Seq((3L, Option.empty[String], "delete"),
      (9L, Option("nine"), "insert"))
      .toDF("doc_id", "new_payload", "op")
    val folded = WarehouseOps.mergeApplyCdc(
      WarehouseOps.mergeApplyCdc(snap0, b1), b2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    // doc 2's 'update' op from trigger 1 survives trigger 2 untouched
    assert(folded == Set(
      (1L, "keep", "one"),
      (2L, "update", "two v2"),
      (9L, "insert", "nine")))
    val single = WarehouseOps.mergeUpsert(base, b1.union(b2),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(folded == single)
  }

  test("scd2 history: consecutive runs collapse into versions, validity " +
    "is contiguous, same-ts ties order by the tie column, exactly one " +
    "current version per key") {
    val events = Seq(
      // user 1: A A B A — three versions
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L),
      // user 2: tie at ts=10 resolved by event_id — A then B
      (2L, "B", 10L, 6L), (2L, "A", 10L, 5L))
      .toDF("user_id", "attr", "ts_us", "event_id")
    val out = WarehouseOps
      .scd2History(events, "user_id", "attr", "ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .toSet
    assert(out == Set(
      (1L, "A", 1L, 10L, 30L, false),
      (1L, "B", 2L, 30L, 40L, false),
      (1L, "A", 3L, 40L, -1L, true),
      (2L, "A", 1L, 10L, 10L, false),
      (2L, "B", 2L, 10L, -1L, true)))
  }

  test("scd2 history: 200 random attribute sequences replay a pure-JVM " +
    "run-collapse reference exactly (seeded property test)") {
    val rnd = new scala.util.Random(13)
    val attrs = Array("A", "B", "C")
    val events = (1 to 200).flatMap { user =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map { i =>
        // ts in coarse steps so same-ts ties occur; event_id breaks them
        (user.toLong, attrs(rnd.nextInt(attrs.length)),
          (rnd.nextInt(5) * 10).toLong, (user * 100 + i).toLong)
      }
    }
    val got = WarehouseOps.scd2History(
      events.toDF("user_id", "attr", "ts_us", "event_id"),
      "user_id", "attr", "ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
      .toSet
    // JVM reference: sort by (ts, event_id), collapse runs, chain validity
    val expect = events.groupBy(_._1).flatMap { case (user, evs) =>
      val runs = evs.sortBy(e => (e._3, e._4))
        .foldLeft(List.empty[(String, Long)]) { (acc, e) =>
          acc match {
            case (a, _) :: _ if a == e._2 => acc
            case _ => (e._2, e._3) :: acc
          }
        }.reverse
      runs.zipWithIndex.map { case ((attr, from), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._2 else -1L
        (user, attr, (i + 1).toLong, from, to, to == -1L)
      }
    }.toSet
    assert(got == expect)
  }

  test("scd2 point-in-time lookup is TOTAL and UNIQUE: every event " +
    "matches exactly one version, and a change event lands in the " +
    "version it opens") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q_scd2_point_in_time")(spark, sf)
      .collect()
    val nEvents = graft.Tables(spark, sf, "events").count()
    assert(out.length.toLong == nEvents, "lookup must be total")
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "an event matched more than one version")
    // a change event's looked-up attr is its OWN event_type (it opens
    // the version) — true for every event that IS a version boundary
    val hist = graft.SparkEntry.queries("q_scd2_history")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getString(1))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val boundary = ev.filter(e => hist.contains((e._2, e._3)) &&
      hist((e._2, e._3)) == e._4)
    assert(boundary.nonEmpty)
    val byId = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    boundary.foreach(e => assert(byId(e._1) == e._4,
      s"boundary event ${e._1} did not land in the version it opens"))
  }

  test("scd2 history on real events: valid_to chains to the next " +
    "version's valid_from and every user has exactly one open version") {
    val sf = "/root/testdata/sf0.001"
    val hist = WarehouseOps.scd2History(
      graft.Tables.events(spark, sf)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id")),
      "user_id", "event_type", "ts_us", "event_id")
    val rows = hist.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_.getLong(2))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      // contiguity: each version's valid_to is the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"validity gap for user $user")
        case _ => ()
      }
      assert(vs.count(_.getBoolean(5)) == 1,
        s"user $user must have exactly one current version")
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
    }
  }
}
