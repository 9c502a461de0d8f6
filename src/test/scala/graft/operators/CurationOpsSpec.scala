package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operators: deterministic hash splits, stratified
  * sampling, PII redaction, composite quality filter. */
class CurationOpsSpec extends SparkSpec {

  private lazy val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("hash split is total, disjoint, and reproducible") {
    val out = q("q_sample_split").cache()
    try {
      val total = out.count()
      val bySplit = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.keySet == Set("train", "val", "test"))
      assert(bySplit.values.sum == total)
      // ~79.7/10.2/10.2 expected; generous tolerance on 500 docs
      assert(bySplit("train") > total * 0.7 && bySplit("train") < total * 0.9)
      // byte-identical on a re-run: membership is a pure function of id
      val again = q("q_sample_split")
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
      // ...and invariant under repartitioning
      val shuffled = q("q_sample_split").repartition(7)
      assert(out.exceptAll(shuffled).isEmpty)
    } finally out.unpersist()
  }

  test("leakage-safe split: every near-dup cluster lands whole in ONE " +
    "split, and singletons match the per-doc assignment exactly") {
    val out = q("q_split_leakage_safe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // no cluster straddles splits — the leakage property itself
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    perCluster.foreach { case (c, splits) =>
      assert(splits.size == 1, s"cluster $c straddles splits: $splits")
    }
    // non-vacuous: the corpus really has a multi-member cluster
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "no multi-member cluster — the leakage property is untested")
    // singletons (cluster_id = own doc_id) degrade to the per-doc rule
    val perDoc = q("q_sample_split").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out.filter { case (d, c, _) => d == c }.foreach { case (d, _, s) =>
      assert(s == perDoc(d), s"singleton $d diverges from q_sample_split")
    }
  }

  test("stratified sampling downsamples the dominant language harder") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val kept = q("q_sample_stratified")
    val rates = docs.groupBy("lang").count()
      .join(kept.groupBy("lang").agg(count(lit(1)).as("k")), "lang")
      .select(col("lang"), (col("k").cast("double") / col("count")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("en") < 0.25, s"en rate ${rates("en")} should be ~0.125")
    rates.filterNot(_._1 == "en").foreach { case (l, r) =>
      assert(r > 0.3 && r < 0.7, s"$l rate $r should be ~0.5")
    }
  }

  test("PII redaction replaces planted emails and phones exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.smith+spam@corp.example.org today"),
      (2L, "call +1 (212) 555-0147 or 0043-1-5550147 now"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      regexp_replace(regexp_replace(col("t"),
        lit(CurationOps.EmailRe), lit("<EMAIL>")),
        lit(CurationOps.PhoneRe), lit("<PHONE>")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(2L) == "call <PHONE> or <PHONE> now")
    assert(out(3L) == "no pii here at all")
  }

  test("gate PII query fires on every augmented row") {
    val out = q("q_text_pii")
    val bad = out.filter(col("n_emails") < 1 || col("n_phones") < 1 ||
      !col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>")).count()
    assert(bad == 0)
  }

  test("composite quality filter keeps and drops, consistent with its signals") {
    val out = q("q_doc_filter").cache()
    try {
      val keeps = out.filter(col("keep")).count()
      val drops = out.filter(!col("keep")).count()
      assert(keeps > 0 && drops > 0, s"keeps=$keeps drops=$drops")
      // every keep satisfies the published thresholds (on the rounded
      // ratios — roundoff can't flip a 6-decimal comparison here)
      val violating = out.filter(col("keep") &&
        (col("n_tokens") < CurationOps.MinTokens ||
          col("stop_ratio") < CurationOps.MinStopRatio - 1e-9 ||
          col("top_token_ratio") > CurationOps.MaxTopTokenRatio + 1e-9)).count()
      assert(violating == 0)
    } finally out.unpersist()
  }

  test("end-to-end pipeline: hash-unique survivors, quality-gated, total splits") {
    val out = q("q_curation_pipeline").cache()
    try {
      val n = out.count()
      assert(n > 0)
      // exactly one survivor per content hash
      assert(out.select("content_hash").distinct().count() == n)
      // survivors all passed the token-count gate
      val docs = graft.Tables(spark, sfDir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("nt"))
      val offGate = out.join(docs, "doc_id")
        .filter(col("nt") < CurationOps.MinTokens ||
          col("nt") > CurationOps.MaxTokens).count()
      assert(offGate == 0)
      // split assignment matches the standalone split query
      val splits = q("q_sample_split").select(col("doc_id"),
        col("split").as("expected"))
      val mismatched = out.join(splits, "doc_id")
        .filter(col("split") =!= col("expected")).count()
      assert(mismatched == 0)
    } finally out.unpersist()
  }

  test("temperature sampling: rarest language keeps ~all, rates fall " +
    "with frequency (alpha = 0.5)") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("q_sample_temperature").groupBy("lang")
      .agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = counts.values.min
    counts.foreach { case (l, n) =>
      val expected = math.sqrt(minCnt.toDouble / n)
      val rate = kept.getOrElse(l, 0L).toDouble / n
      // hash buckets over <=200 docs/lang: generous +/-0.15 band
      assert(math.abs(rate - expected) < 0.15,
        s"$l rate $rate vs expected $expected")
    }
    // the anchor language keeps (nearly) everything: only the single
    // top bucket 'ffff' is excluded by the 65535 cap
    val rarest = counts.minBy(_._2)._1
    assert(kept(rarest).toDouble / counts(rarest) > 0.95)
  }

  test("sequence packing: starts reconstruct the running sum, offsets " +
    "stay inside the context window, shards pack independently") {
    val out = q("q_pack_sequences").cache()
    try {
      assert(out.count() == graft.Tables(spark, sfDir, "documents").count())
      // offset in [0, ctx); start position = seq_id*ctx + offset must
      // equal the tokens accumulated before the doc within its shard
      assert(out.filter(col("seq_offset") < 0 ||
        col("seq_offset") >= CurationOps.PackContext).count() == 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Long.MinValue, -1)
      val recon = out.withColumn("before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .filter(col("seq_id") * CurationOps.PackContext + col("seq_offset")
          =!= col("before"))
      assert(recon.count() == 0, "start positions must equal the prefix sum")
      // every shard starts its own window sequence at (0, 0)
      val firstPerShard = out.groupBy("shard")
        .agg(min(col("doc_id")).as("doc_id"))
        .join(out, Seq("shard", "doc_id"))
        .filter(col("seq_id") =!= 0L || col("seq_offset") =!= 0L)
      assert(firstPerShard.count() == 0)
    } finally out.unpersist()
  }

  test("global shuffle is a stable permutation that actually permutes") {
    val out = q("q_shuffle_global").cache()
    try {
      val n = out.count()
      // positions are exactly 1..N with no gaps or repeats
      val stats = out.agg(min(col("pos")), max(col("pos")),
        countDistinct(col("pos"))).collect()(0)
      assert(stats.getLong(0) == 1L && stats.getLong(1) == n &&
        stats.getLong(2) == n)
      // pure function of the ids: identical on a re-run
      assert(out.exceptAll(q("q_shuffle_global")).isEmpty)
      // and it is a real shuffle, not the identity ordering
      val fixedPoints = out.filter(col("pos").cast("long") === col("doc_id") + 1)
        .count()
      assert(fixedPoints < n / 10, s"$fixedPoints of $n docs kept their slot")
    } finally out.unpersist()
  }

  test("source mix honors the per-class rates with independently computed buckets") {
    import spark.implicits._
    // goldens computed OUTSIDE Spark (python hashlib): md5("0")=cfcd…,
    // md5("3")=eccb…, md5("7")=8f14…, md5("11")=6512…, md5("400")=18d8…
    // rate classes: src0→<c000 (75%), src1→<8000, src2→<4000, src3→<2000
    val docs = Seq(
      (0L, "src0"),   // cfcd ≥ c000 → out even at the 75% rate
      (7L, "src0"),   // 8f14 < c000 → in
      (7L, "src1"),   // 8f14 ≥ 8000 → out at 50%
      (11L, "src1"),  // 6512 < 8000 → in
      (11L, "src2"),  // 6512 ≥ 4000 → out at 25%
      (400L, "src2"), // 18d8 < 4000 → in
      (400L, "src3"), // 18d8 < 2000 → in even at 12.5%
      (3L, "src3")    // eccb → out
    ).toDF("doc_id", "text").withColumnRenamed("text", "source")
    val out = CurationOps.sourceMix(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getBoolean(3))).toMap
    assert(out((0L, "src0")) == ("cfcd", false))
    assert(out((7L, "src0")) == ("8f14", true))
    assert(out((7L, "src1")) == ("8f14", false))
    assert(out((11L, "src1")) == ("6512", true))
    assert(out((11L, "src2")) == ("6512", false))
    assert(out((400L, "src2")) == ("18d8", true))
    assert(out((400L, "src3")) == ("18d8", true))
    assert(out((3L, "src3")) == ("eccb", false))
  }

  test("dsir importance weights rank target-like docs above off-target " +
    "docs, selection flag tracks the rounded score") {
    import spark.implicits._
    val alpha = "red green blue yellow red green blue yellow red green"
    val beta = "kat dog fish bird kat dog fish bird kat dog"
    val docs = Seq(
      (1L, "en", alpha), (2L, "en", alpha),
      (3L, "en", alpha), (4L, "en", alpha),
      (5L, "xx", beta), (6L, "xx", beta),
      (7L, "xx", alpha) // off-target lang, target-like CONTENT
    ).toDF("doc_id", "lang", "text")
    val out = CurationOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_ngrams"),
        r.getAs[Double]("dsir_logratio"), r.getAs[Boolean]("selected")))
      .toMap
    assert(out(7L)._1 == 19L) // 10 unigrams + 9 bigrams
    // DSIR scores content, not the lang label: the alpha-vocab xx doc
    // beats both beta-vocab xx docs, as do the target docs themselves
    assert(out(7L)._2 > out(5L)._2 && out(7L)._2 > out(6L)._2)
    assert(out(1L)._2 > out(5L)._2)
    out.values.foreach { case (_, s, sel) => assert(sel == (s > 0.0)) }
    // weight is a pure function of corpus content — partitioning-proof
    val again = CurationOps.dsirWeights(docs.repartition(5))
    assert(CurationOps.dsirWeights(docs).exceptAll(again).isEmpty)
  }

  test("weighted sample: proportional-to-weight inclusion, scale-invariant " +
    "selection, reproducible under repartitioning") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
    val out = CurationOps.weightedSample(docs).cache()
    try {
      assert(out.count() == CurationOps.WeightedSampleK)
      // exponential race biases toward heavy docs: the sample's mean
      // weight must exceed the corpus mean (weights span ~48..550)
      val sampleMean = out.agg(avg(col("w"))).head.getDouble(0)
      val corpusMean = docs.agg(avg(col("n_chars"))).head.getDouble(0)
      assert(sampleMean > corpusMean,
        s"sample mean $sampleMean should exceed corpus mean $corpusMean")
      // Efraimidis-Spirakis invariant: scaling every weight by the
      // same constant rescales all keys by 1/c and leaves the
      // SELECTED SET unchanged
      val scaled = CurationOps.weightedSample(
        docs.withColumn("n_chars", col("n_chars") * 7))
      val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
      val b = scaled.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a == b)
      // pure per-row hash math → partitioning-proof
      val again = CurationOps.weightedSample(docs.repartition(7))
      assert(out.exceptAll(again).isEmpty)
    } finally out.unpersist()
  }

  test("corpus delta: the four snapshot states land exactly where the " +
    "geometry says") {
    // doc_ids are dense 0..n-1: old = 0..29, new = 10..n-1 →
    // removed 0..9, added 30..n-1, overlap 10..29 with every 7th
    // (14, 21, 28) edited → changed
    val n = graft.Tables(spark, sfDir, "documents").count()
    val out = q("q_corpus_delta").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.size == n)
    (0L to 9L).foreach(id => assert(out(id) == "removed"))
    (30L until n).foreach(id => assert(out(id) == "added"))
    Seq(14L, 21L, 28L).foreach(id => assert(out(id) == "changed"))
    assert(out.count(_._2 == "unchanged") == 17)
  }

  test("version diff over the swap machinery equals the snapshot diff " +
    "row for row, and the full-outer join of the two bucketed " +
    "versions runs with NO exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val want = q("q_corpus_delta").collect().map(_.toSeq).toSet
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val diff = q("q_version_diff")
      assert(diff.collect().map(_.toSeq).toSet == want,
        "version diff diverged from the snapshot diff")
      // both versions carry the swap's doc_id bucketing, so the
      // full-outer join needs no exchange on either side
      def subtree(p: SparkPlan): Seq[SparkPlan] =
        p +: p.children.flatMap(subtree)
      assert(!subtree(diff.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        "version diff must join the co-bucketed versions " +
          s"exchange-free:\n${diff.queryExecution.executedPlan}")
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      graft.sources.Sources.dropVersioned(spark, "graft_snap")
    }
  }

  test("dsir weights match a pure-JVM reference implementation " +
    "(hashed n-grams -> smoothed distributions -> mean log ratio)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables(spark, sfDir, "documents")
    val corpus = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    def ngrams(t: Seq[String]): Seq[String] =
      t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val buckets = corpus.map { case (id, lang, t) =>
      (id, lang, ngrams(t).map(ng => md5hex(ng).substring(0, 2)))
    }
    val cr = buckets.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val ct = buckets.filter(_._2 == CurationOps.DsirTargetLang)
      .flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val nr = cr.values.sum
    val nt = ct.values.sum
    val B = CurationOps.DsirBuckets.toLong
    def lr(b: String): Double =
      math.log(((ct.getOrElse(b, 0L) + 1) * (nr + B)).toDouble
        / ((cr(b) + 1) * (nt + B)).toDouble)
    val ref = buckets.map { case (id, _, bs) =>
      val score = BigDecimal(bs.map(lr).sum / bs.length)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> (bs.length.toLong, score, score > 0.0)
    }.toMap
    val got = CurationOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_ngrams"),
        r.getAs[Double]("dsir_logratio"), r.getAs[Boolean]("selected"))).toMap
    // the per-doc mean reassociates across implementations; compare
    // counts/flags exactly and scores to within one rounding step
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, (nG, s, sel)) =>
      assert(nG == ref(id)._1, s"doc $id n_ngrams")
      assert(math.abs(s - ref(id)._2) <= 1e-6 + 1e-12, s"doc $id score")
      assert(sel == ref(id)._3 || math.abs(s) <= 2e-6, s"doc $id flag")
    }
  }

  test("weighted sample matches a pure-JVM reference implementation " +
    "end to end (hash -> uniform -> race key -> k-cut)") {
    // independent of BOTH engines: reimplement the chain with
    // MessageDigest + Math.log and compare the full selection
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables(spark, sfDir, "documents")
    val ref = docs.select("doc_id", "n_chars").collect()
      .map { r =>
        val (id, w) = (r.getLong(0), r.getLong(1))
        val u = (java.lang.Long.parseLong(
          md5hex(id.toString).substring(0, 6), 16).toDouble + 1.0) /
          CurationOps.HexDraw6Denom
        (id, w, -math.log(u) / w.toDouble)
      }
      .sortBy { case (id, _, key) => (key, id) }
      .take(CurationOps.WeightedSampleK)
      .map { case (id, w, key) =>
        // Spark's round() is decimal HALF_UP — mirror it exactly
        (id, w, BigDecimal(key)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.toSeq
      // compare in (rounded key, id) order: the cut ran on unrounded
      // keys, but rounding can tie two selected rows
      .sortBy(t => (t._3, t._1))
    val got = CurationOps.weightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(t => (t._3, t._1))
    assert(got == ref)
  }

  test("source cap: bounded aggregator elects the same survivors as the " +
    "window form, never more than cap per source") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val out = CurationOps.sourceCap(docs, cap = 2).cache()
    try {
      val perSource = out.groupBy("source").count().collect()
      assert(perSource.forall(_.getLong(1) <= 2))
      // the digest-shuffling aggregator must equal the window form
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(conv(substring(CurationOps.idHash(col("doc_id")), 1, 6),
          16, 10).cast("long").asc, col("doc_id"))
      val windowForm = docs
        .select(col("source"), col("doc_id"),
          conv(substring(CurationOps.idHash(col("doc_id")), 1, 6), 16, 10)
            .cast("long").as("prio"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("source"), col("doc_id"), col("prio"), col("rnk"))
      assert(out.exceptAll(windowForm).isEmpty &&
        windowForm.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("sliding chunks: full coverage, stride overlap, and a short doc " +
    "is exactly one window") {
    import spark.implicits._
    val (w, s) = (CurationOps.ChunkWindow, CurationOps.ChunkStride)
    val long = (1 to 150).map(i => s"w$i").mkString(" ") // 150 tokens
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq((0L, long), (1L, short)).toDF("doc_id", "text")
    val rows = CurationOps.slidingChunks(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

    val shortRows = rows.filter(_._1 == 1L)
    assert(shortRows.length == 1 && shortRows.head._3 == 10)

    // 150 tokens, w=64 s=32: starts 0,32,64,96 → 4 chunks; the last
    // reaches token 150 (n_tokens 54) and none starts past the end
    val longRows = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(longRows.map(_._2).toSeq == (0 until 4))
    assert(longRows.map(_._3).toSeq == Seq(64, 64, 64, 54))
    // coverage: consecutive windows overlap by exactly w - s tokens,
    // so every token index is inside at least one window
    val spans = longRows.map(r => (r._2 * s + 1, r._2 * s + r._3))
    assert(spans.head._1 == 1 && spans.last._2 == 150)
    spans.sliding(2).foreach { case Array((_, e1), (s2, _)) =>
      assert(s2 <= e1 + 1, "gap between consecutive windows")
    }
    // chunk hash is the hash of exactly the window's tokens
    val toks = long.split(" ")
    val expect0 = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.slice(0, 64).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(longRows.head._4 == expect0)
  }

  test("token budget plan: hand-computed targets and epochs, and the " +
    "targets never overspend the budget") {
    import spark.implicits._
    // src0 → weight 1, src1 → weight 2 (class = index % 4); budget 300
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, "src0", words("a", 10)), (1L, "src0", words("b", 10)),
      (2L, "src1", words("c", 400))).toDF("doc_id", "source", "text")
    val out = CurationOps.tokenBudgetPlan(docs, 300L).collect()
      .map(r => r.getString(0) -> r).toMap
    // w_total = 3: src0 target floor(300/3)=100 over 20 tokens → 500%
    assert(out("src0").getLong(1) == 2 && out("src0").getLong(2) == 20)
    assert(out("src0").getLong(4) == 100 && out("src0").getLong(5) == 500)
    assert(out("src0").getBoolean(6))
    // src1 target floor(600/3)=200 over 400 tokens → 50%, no repeat
    assert(out("src1").getLong(4) == 200 && out("src1").getLong(5) == 50)
    assert(!out("src1").getBoolean(6))
    assert(out.values.map(_.getLong(4)).sum <= 300L)
    // gate shape: every source planned exactly once, spend <= budget
    val sf = "/root/testdata/sf0.001"
    val gate = graft.SparkEntry.queries("q_token_budget")(spark, sf).collect()
    assert(gate.map(_.getString(0)).distinct.length == gate.length)
    assert(gate.map(_.getLong(4)).sum <= CurationOps.TokenBudget)
  }

  test("epoch expansion: whole epochs repeat exactly, the fractional " +
    "copy follows the hash bucket, and the multiset survives " +
    "repartitioning") {
    import spark.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // same geometry as the token-budget fixture: src0 → 500% (5 whole
    // copies, frac 0), src1 → 50% (0 whole, frac 50 → copy iff
    // b4 < 32768; md5("2")[:4] = 0xc81e = 51230 → doc 2 drops out)
    val docs = Seq(
      (0L, "src0", words("a", 10)), (1L, "src0", words("b", 10)),
      (2L, "src1", words("c", 400))).toDF("doc_id", "source", "text")
    val out = CurationOps.epochExpand(docs, 300L).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(0L, 1L))
    Seq(0L, 1L).foreach { id =>
      val rows = byDoc(id)
      assert(rows.length == 5)
      assert(rows.map(_.getLong(2)).sorted.toSeq == (0L to 4L))
      assert(rows.forall(_.getLong(3) == 5L))
    }
    // partitioning invariance: identical multiset from a reshuffled input
    val re = CurationOps.epochExpand(docs.repartition(7), 300L).collect()
    assert(re.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq ==
      out.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    // gate shape: per-source emitted copies = sum of that source's
    // n_copies, and every source's copy mass tracks its plan
    val sf = "/root/testdata/sf0.001"
    val g = graft.SparkEntry.queries("q_epoch_expand")(spark, sf).collect()
    assert(g.nonEmpty)
    g.groupBy(r => (r.getLong(0), r.getLong(3))).foreach {
      case ((_, n), rows) =>
        assert(rows.length == n)
        assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until n))
    }
  }

  test("c4 clean: each rule fires on its planted chunk, the rewrite " +
    "keeps document order, and sparse docs are dropped") {
    import spark.implicits._
    // chunk geometry is 10 tokens; craft docs chunk-by-chunk
    val good = "w1 w2 w3 the w5 w6 w7 w8 w9 w10"     // kept
    val noFn = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"      // no 'the'/'a' → drop
    val bad = "w1 w2 the w4 dup w6 w7 w8 w9 w10"     // blacklist → drop
    val docs = Seq(
      // 3 kept chunks (good ×3) → doc_keep=1, rewrite = all three
      (0L, s"$good $good $good"),
      // rules fire individually: good, noFn, bad, short-tail "a the"
      // (2 tokens < 3 → drop) → 1 kept < 3 → doc_keep=0
      (1L, s"$good $noFn $bad a the"),
      // short tail that PASSES min-tokens but has no function word
      (2L, s"$good $good w1 w2 w3 w4"),
      (3L, "")) // empty text → split gives [""], 1-token chunk, dropped
      .toDF("doc_id", "text")
    val out = CurationOps.cleanC4(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(0L) == ((3, 3, 1, s"$good $good $good")))
    assert(out(1L) == ((4, 1, 0, good)))
    assert(out(2L) == ((3, 2, 0, s"$good $good")))
    assert(out(3L) == ((1, 0, 0, "")))
    // order preservation: kept chunks re-assemble in document order,
    // not rule order — plant kept chunks around a dropped middle
    val mid = CurationOps.cleanC4(
      Seq((9L, s"$good $noFn ${good.replace("w10", "zz")}"))
        .toDF("doc_id", "text")).collect().head
    assert(mid.getString(4) == s"$good ${good.replace("w10", "zz")}")
    // gate shape at sf0.001: the screen discriminates — some docs
    // kept, some dropped, and n_kept ≤ n_chunks everywhere
    val g = graft.SparkEntry.queries("q_clean_c4")(spark, sfDir).collect()
    assert(g.forall(r => r.getInt(2) <= r.getInt(1)))
    val keeps = g.map(_.getInt(3)).toSet
    assert(keeps == Set(0, 1))
  }
}
