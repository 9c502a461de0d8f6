package graft

import org.apache.spark.sql.functions._

/** Schema contract for the `events.ts` decoding rule.
  *
  * The driver's testdata has silently changed `ts`'s physical parquet
  * encoding once already (TIMESTAMP(NANOS) through round 9, naive
  * `timestamp[us]` from round 10 — which Spark 4 reads as
  * TIMESTAMP_NTZ and which broke 13 gate queries for a round). This
  * suite writes a fixture per encoding and pins that
  * [[Tables.tsUsColumn]] resolves every one of them to the SAME epoch
  * micros, so the next silent change fails here first, not in the
  * correctness gate.
  */
class TablesSpec extends SparkSpec {

  // 2023-11-14T22:13:20Z and one second later, as epoch micros
  private val micros = Seq(1700000000000000L, 1700000001000000L)

  private def roundTrip(writeDf: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_fixture")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(dir)
    val path = dir.resolve("events.parquet").toString
    writeDf.coalesce(1).write.mode("overwrite").parquet(path)
    val e = spark.read.parquet(path)
    e.withColumn("ts_us", Tables.tsUsColumn(e.schema("ts").dataType))
      .select("ts_us").collect().map(_.getLong(0)).toSeq.sorted
  }

  test("ts as TIMESTAMP_NTZ (timestamp[us], round-10+ testdata) resolves to epoch micros") {
    import spark.implicits._
    val df = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(roundTrip(df) === micros)
  }

  test("ts as TIMESTAMP_LTZ resolves to epoch micros") {
    import spark.implicits._
    val df = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(roundTrip(df) === micros)
  }

  test("ts as a nanos Long (TIMESTAMP(NANOS) under nanosAsLong, round-≤9 testdata) resolves to epoch micros") {
    // Spark cannot AUTHOR TIMESTAMP(NANOS) parquet; under
    // spark.sql.legacy.parquet.nanosAsLong=true such a file reads back
    // as a plain int64 of nanos — byte-identical to this fixture, so
    // the LongType arm is exercised exactly as the old testdata did.
    import spark.implicits._
    val df = micros.map(_ * 1000L).toDF("ts")
    assert(roundTrip(df) === micros)
  }

  test("real testdata events resolves ts_us at every scale factor") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val e = Tables.events(spark, s"/root/testdata/$sf")
      val n = e.filter(col("ts_us").isNotNull).limit(1).count()
      assert(n === 1L, s"$sf: ts_us did not resolve")
    }
  }

  test("testdata column-type contracts the operators assume hold at " +
    "every scale factor") {
    // the ts encoding silently changed shape once (r9→r10) and broke
    // 13 queries; these are the OTHER silent changes that would break
    // whole families the same way. Fail here, loudly, instead.
    import org.apache.spark.sql.types._
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val emb = Tables(spark, dir, "embeddings").schema
      // CosineSimilarity (and every ANN gate) requires array<float>
      assert(emb("embedding").dataType === ArrayType(FloatType),
        s"$sf: embeddings.embedding is ${emb("embedding").dataType} — " +
          "every similarity operator assumes array<float>")
      assert(emb("vec_id").dataType === LongType, s"$sf: vec_id type")
      val docs = Tables(spark, dir, "documents").schema
      assert(docs("doc_id").dataType === LongType, s"$sf: doc_id type")
      assert(docs("text").dataType === StringType, s"$sf: text type")
      Seq("source", "lang").foreach(c =>
        assert(docs(c).dataType === StringType, s"$sf: $c type"))
      val ev = Tables(spark, dir, "events").schema
      Seq("user_id", "event_id").foreach(c =>
        assert(ev(c).dataType === LongType, s"$sf: events.$c type"))
      assert(ev("event_type").dataType === StringType,
        s"$sf: event_type type")
    }
  }

  test("Tables() memoizes the resolved relation per (session, dir, " +
    "table) — and the memo is a metadata cache, not a result cache") {
    val dir = "/root/testdata/sf0.001"
    // same session + same (dir, table) → the SAME DataFrame instance
    // (the ~100 ms spark.read.parquet resolution runs once, r21)
    val a = Tables(spark, dir, "nation")
    val b = Tables(spark, dir, "nation")
    assert(a eq b, "repeat call must return the memoized frame")
    // different dir or table → distinct entries (scale factors and
    // tables must never alias)
    assert(!(Tables(spark, dir, "region") eq a))
    assert(!(Tables(spark, "/root/testdata/sf0.01", "nation") eq a))
    // a DIFFERENT session gets its own frame (a DataFrame is bound to
    // the session that resolved it)
    val s2 = spark.newSession()
    val c = Tables(s2, dir, "nation")
    assert(!(c eq a))
    assert(c.sparkSession eq s2)
    // the memoized frame still computes from the files — equal rows
    // to a fresh, unmemoized read (metadata cache, not data cache)
    val fresh = spark.read.parquet(s"$dir/nation.parquet")
    assert(a.count() === fresh.count())
    assert(a.selectExpr("sum(n_nationkey)").head.getLong(0) ===
      fresh.selectExpr("sum(n_nationkey)").head.getLong(0))
  }
}
