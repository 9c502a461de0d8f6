package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextVec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, a
  * sign-bit LSH bucketing as the approximate scale path, and the IVF
  * (inverted-file) assignment step.
  *
  * Scale design: the query side of every join here is tiny (a handful
  * of probe vectors / 8 centroids) and explicitly `broadcast` — the
  * full corpus is streamed map-side, never shuffled. At 100 TB the
  * brute-force path stays a single narrow scan per probe batch; the
  * LSH/IVF paths cut the scanned fraction by bucketing the corpus
  * once (a one-time shuffle on the bucket key) and pruning probes to
  * matching buckets.
  */
object SimilarityOps {

  val NumProbes = 5     // vec_id < 5 are the query vectors
  val TopK = 3
  val NumCentroids = 8  // vec_id < 8 seed the IVF centroids
  val LshBits = 16      // sign bits of the first 16 dims

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Sequential-sum cosine matching the oracle's list_sum order. */
  private val cosExpr =
    cosine(col("qv"), col("embedding"))

  val all: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k: exact ANN baseline. Probe vectors are
    // broadcast; corpus is scanned once; per-probe ranking via window.
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
      (s, dir) =>
        val q = emb(s, dir).filter(col("vec_id") < NumProbes)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val scored = emb(s, dir).join(broadcast(q),
            col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosExpr.as("cos"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= TopK)
          .select(col("query_id"), col("neighbor_id"), col("rnk"),
            round(col("cos"), 6).as("sim"))
    },

    // Sign-bit LSH bucketing (random-hyperplane family with axis
    // planes): maps each vector to a 16-bit bucket; equal buckets ⇒
    // near-duplicate candidates via equi-join. Bucket histogram
    // included so skew is observable.
    QueryDef.sql(
      "q_sim_lsh_buckets",
      s"""SELECT vec_id, label,
         |       CAST(list_sum(list_transform(range($LshBits),
         |              j -> CASE WHEN embedding[j+1] > 0 THEN 2**j ELSE 0 END))
         |            AS INTEGER) AS bucket
         |FROM embeddings""".stripMargin) {
      (s, dir) =>
        val bucket = (0 until LshBits)
          .map(j => when(element_at(col("embedding"), j + 1) > 0f,
            lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _)
        emb(s, dir).select(col("vec_id"), col("label"),
          bucket.cast("int").as("bucket"))
    },

    // IVF assignment: nearest of 8 seed centroids per vector by
    // cosine. This is the partitioning step of an IVF index — the
    // probe step (search only the probed centroid's partition) is
    // exercised in the test suite.
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
         |  FROM c JOIN embeddings e ON true)
         |SELECT vec_id, centroid_id, round(cos, 6) AS sim
         |FROM (SELECT vec_id, centroid_id, cos,
         |             row_number() OVER (PARTITION BY vec_id
         |                                ORDER BY cos DESC, centroid_id) AS rnk
         |      FROM scored)
         |WHERE rnk = 1""".stripMargin) {
      (s, dir) =>
        val c = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("qv"))
        val scored = emb(s, dir).crossJoin(broadcast(c))
          .select(col("vec_id"), col("centroid_id"), cosExpr.as("cos"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("centroid_id"))
        scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select(col("vec_id"), col("centroid_id"),
            round(col("cos"), 6).as("sim"))
    }
  )
}
