package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{CosineSimilarity, TextVec}
import graft.functions.TextVec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, sign-bit LSH
  * bucketing, and an IVF (inverted-file) index — assignment plus
  * probe-limited search.
  *
  * Scale design: probe/centroid sides are tiny and always
  * `broadcast`; the corpus is streamed map-side, never shuffled for
  * scoring. IVF cuts the scanned fraction to nprobe/ncentroids of the
  * corpus after a one-time bucketing shuffle — the standard ANN
  * recall/throughput trade, measured in the test suite.
  */
object SimilarityOps {

  val NumProbes = 5     // vec_id < 5 are the gate's query vectors
  val TopK = 3
  val NumCentroids = 8  // vec_id < 8 seed the gate's IVF centroids
  val LshBits = 16      // sign bits of the first 16 dims

  /** Cross-score corpus (vec_id, embedding) against broadcast probes
    * (query_id, qv): one row per (query, vector) pair with sequential
    * double-precision cosine. */
  def cosineScores(corpus: DataFrame, probes: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(probes))
      .select(col("query_id"), col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("qv"), col("embedding")).as("cos"))

  /** Exact top-k neighbors per probe (excluding self-matches). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cosineScores(corpus, probes)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("sim"))
  }

  /** 16-bit sign-bucket per vector (axis-plane LSH for cosine). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val bucket = (0 until LshBits)
      .map(j => when(element_at(col("embedding"), j + 1) > 0f,
        lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    emb.select(col("vec_id") +: emb.columns.filter(_ == "label").map(col).toSeq :+
      bucket.cast("int").as("bucket"): _*)
  }

  /** IVF assignment: nearest centroid per corpus vector by cosine.
    * centroids must be (centroid_id, cv). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"),
        CosineSimilarity(corpus.sparkSession, col("cv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("cos"), 6).as("sim"))

  /** IVF centroid training: k-means (Lloyd) iterations with strided
    * seeds (vec_id % (n/k) == 0 — spread across the corpus; first-k
    * seeding collapses when early rows share a cluster; assumes
    * roughly dense vec_ids). Each iteration is one cross-score pass +
    * one groupBy-mean, checkpointed so lineage doesn't compound;
    * centroids stay tiny and broadcast. Ties break on centroid_id;
    * mean accumulation order is Spark's, so coordinates can vary in
    * final ulps across runs (assignment flips only for vectors
    * near-equidistant between cells).
    *
    * Robustness: a cell that loses all members or degenerates to the
    * zero vector (cosine undefined) keeps its previous centroid
    * rather than vanishing or capturing the whole corpus via
    * NaN-sorts-first.
    */
  def ivfTrain(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val firstRow = corpus.select(size(col("embedding")).as("d")).limit(1).collect()
    require(firstRow.nonEmpty, "ivfTrain: empty corpus")
    val dim = firstRow(0).getInt(0)
    val n = corpus.count()
    val stride = math.max(1L, n / k)
    var centroids = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      val assigned = ivfAssign(corpus, centroids)
        .select(col("vec_id"), col("centroid_id"))
        .join(corpus.select(col("vec_id"),
          col("embedding").cast("array<double>").as("v")), "vec_id")
      val dimCols = (0 until dim).map(i =>
        avg(element_at(col("v"), i + 1)).as(s"d$i"))
      val means = assigned.groupBy(col("centroid_id"))
        .agg(dimCols.head, dimCols.tail: _*)
        .select(col("centroid_id"),
          array((0 until dim).map(i => col(s"d$i")): _*)
            .cast("array<float>").as("new_cv"))
      val nonDegenerate = means.filter(
        aggregate(transform(col("new_cv"), x => abs(x)),
          lit(0.0), (acc, x) => acc + x) > 0)
      // empty/degenerate cells keep their previous centroid
      centroids = centroids.as("prev")
        .join(nonDegenerate, Seq("centroid_id"), "left_outer")
        .select(col("centroid_id"),
          coalesce(col("new_cv"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    centroids
  }

  /** IVF probe search: score each query only against vectors whose
    * cell is among the query's nprobe nearest centroids. Same output
    * shape as [[bruteForceTopK]] so recall is directly comparable. */
  def ivfSearch(
      corpus: DataFrame, centroids: DataFrame, probes: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val cells = ivfAssign(corpus, centroids)
      .select(col("vec_id"), col("centroid_id"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"),
        col("centroid_id").as("probe_centroid"),
        CosineSimilarity(probes.sparkSession, col("qv"), col("cv")).as("ccos"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("probe_centroid"))))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("probe_centroid"))
    val candidates = corpus
      .join(cells, "vec_id")
      .join(broadcast(probeCells), col("centroid_id") === col("probe_centroid"))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates
      .select(col("query_id"), col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("sim"))
  }

  /** Embedding-cosine near-dup: the N most similar vector pairs in
    * the corpus. With a corpus that fits one broadcast this is a
    * single map-side pass + TakeOrdered; at scale the same semantics
    * run through [[lshBuckets]] blocking first (pairs within a bucket)
    * — the LSH path is exercised in the test suite.
    */
  def cosineNearDupTopN(emb: DataFrame, n: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"),
        CosineSimilarity(emb.sparkSession, col("va"), col("vb")).as("cos"))
      .orderBy(col("cos").desc, col("a"), col("b"))
      .limit(n)
      .select(col("a"), col("b"), round(col("cos"), 6).as("sim"))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  private def gateProbes(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  val all: Seq[QueryDef] = Seq(

    // Vector hygiene for embedding pipelines: L2 norm and symmetric
    // int8 quantization (per-vector max-abs scale) — the storage-side
    // half of similarity search at 100 TB (4× smaller than float32).
    // Scalar outputs only: stringified float arrays don't hash
    // portably across engines.
    QueryDef.sql(
      "q_embed_quantize",
      """SELECT vec_id,
        |       round(sqrt(list_sum(list_transform(embedding,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
        |       CAST(round(127.0 * CAST(embedding[1] AS DOUBLE)
        |            / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS INTEGER) AS q0,
        |       CAST(round(127.0 * CAST(embedding[2] AS DOUBLE)
        |            / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS INTEGER) AS q1
        |FROM embeddings""".stripMargin) {
      (s, dir) =>
        val vd = col("embedding").cast("array<double>")
        val maxAbs = array_max(transform(vd, x => abs(x)))
        def q(i: Int) = round(lit(127.0) * element_at(vd, i + 1) / maxAbs)
          .cast("int")
        emb(s, dir).select(
          col("vec_id"),
          round(sqrt(aggregate(transform(vd, x => x * x), lit(0.0),
            (acc, x) => acc + x)), 6).as("l2_norm"),
          q(0).as("q0"), q(1).as("q1"))
    },

    // dedup family: embedding-cosine near-dup (top-20 pairs; the
    // corpus is isotropic-random so a fixed threshold would be empty).
    QueryDef.sql(
      "q_dedup_embedding_cosine",
      """WITH scored AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |         list_sum(list_transform(range(len(a.embedding)),
        |           i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))
        |         / (sqrt(list_sum(list_transform(range(len(a.embedding)),
        |              i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(a.embedding[i+1] AS DOUBLE))))
        |          * sqrt(list_sum(list_transform(range(len(b.embedding)),
        |              i -> CAST(b.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE)))))
        |         AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a, b, round(cos, 6) AS sim FROM scored
        |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin) {
      (s, dir) => cosineNearDupTopN(emb(s, dir), 20)
    },

    QueryDef.sql(
      "q_sim_cosine_topk",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NumProbes),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         list_sum(list_transform(range(len(qv)),
         |           i -> CAST(qv[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))
         |         / (sqrt(list_sum(list_transform(range(len(qv)),
         |              i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))))
         |          * sqrt(list_sum(list_transform(range(len(e.embedding)),
         |              i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))))
         |         AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(cos, 6) AS sim
         |FROM (SELECT query_id, neighbor_id, cos,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM scored)
         |WHERE rnk <= $TopK""".stripMargin) {
      (s, dir) => bruteForceTopK(emb(s, dir), gateProbes(s, dir), TopK)
    },

    QueryDef.sql(
      "q_sim_lsh_buckets",
      s"""SELECT vec_id, label,
         |       CAST(list_sum(list_transform(range($LshBits),
         |              j -> CASE WHEN embedding[j+1] > 0 THEN 2**j ELSE 0 END))
         |            AS INTEGER) AS bucket
         |FROM embeddings""".stripMargin) {
      (s, dir) => lshBuckets(emb(s, dir))
    },

    QueryDef.sql(
      "q_sim_ivf_assign",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |         list_sum(list_transform(range(len(qv)),
         |           i -> CAST(qv[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))
         |         / (sqrt(list_sum(list_transform(range(len(qv)),
         |              i -> CAST(qv[i+1] AS DOUBLE) * CAST(qv[i+1] AS DOUBLE))))
         |          * sqrt(list_sum(list_transform(range(len(e.embedding)),
         |              i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(e.embedding[i+1] AS DOUBLE)))))
         |         AS cos
         |  FROM c CROSS JOIN embeddings e)
         |SELECT vec_id, centroid_id, round(cos, 6) AS sim
         |FROM (SELECT vec_id, centroid_id, cos,
         |             row_number() OVER (PARTITION BY vec_id
         |                                ORDER BY cos DESC, centroid_id) AS rnk
         |      FROM scored)
         |WHERE rnk = 1""".stripMargin) {
      (s, dir) =>
        val centroids = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        ivfAssign(emb(s, dir), centroids)
    }
  )
}
