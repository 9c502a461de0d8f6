package graft.operators

import graft.operators.Materialize.PinOps
import graft.{QueryDef, Tables}
import graft.functions.{CosineSimilarity, TextVec}
import graft.functions.TextVec._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  val NumProbeCells = 2 // gate IVF search scans 2 of the 8 cells
  val IvfIngestMod = 5  // vec_id % 5 == 4 plays the newly-arriving slice
  val LabelNoiseK = 5   // kNN vote size for the label-noise screen
  val KnnGraphK = 4     // neighbor fan-out of the mutual-kNN graph
  val BitextMineK = 4   // neighborhood size of the margin denominator
  val NNDescentK = 12      // NN-Descent neighbor list size
  val NNDescentRounds = 4  // NN-Descent refinement rounds (0.03→0.91
                           // measured recall vs brute force here)
  val NNDescentInitA = 45007L // init hash multiplier (mixes mod n)
  val NNDescentInitB = 9239L  // init hash stride across the K+2 draws

  /** Near-dup blocking bands: 2 bands × 8 sign bits (dims 1-16).
    * P(two random vectors collide) ≈ bands/2^bits ≈ 0.8%, so the
    * candidate set is ~1% of all pairs; at larger corpora raise
    * `NearDupBandBits` to keep buckets sub-quadratic (buckets shrink
    * 2× per added bit — the standard LSH recall/cost dial). */
  val NearDupBands = 2
  val NearDupBandBits = 8

  /** Product-quantization geometry: 64-dim vectors split into
    * PqSubspaces contiguous PqSubDim-dim subvectors, each coded
    * against a PqCentroids-entry per-subspace codebook seeded from
    * the first PqCentroids vectors (the deterministic stand-in for a
    * k-means-trained codebook — `ivfTrain` is the training analog). */
  val PqSubspaces = 4
  val PqSubDim = 16

  /** Full embedding dimensionality of the gate corpus — pinned by
    * `TablesSpec`'s column-type contracts. */
  val EmbDim: Int = PqSubspaces * PqSubDim
  // the GATE codebook is deliberately tiny and SEEDED (deterministic,
  // oracle-replicable); quantization quality comes from pqTrain's
  // k-means codebook, whose recall the spec measures against the
  // seeded one. Production uses a trained 256/subspace codebook.
  val PqCentroids = 4

  /** Residual codebook seed for IVFADC: the first [[PqCentroids]]
    * vectors AFTER the IVF seed block (whose own residuals are
    * all-zero). Declared BEFORE `all` — the oracle SQL interpolates
    * it during object init. */
  val ResidualSeedFrom: Int = NumCentroids

  /** Lloyd rounds for the TRAINED-codebook gate query — fixed and
    * small so the oracle can unroll the identical iterations as
    * chained CTEs. Declared BEFORE `all` (oracle interpolation). */
  val PqTrainGateIters = 2

  /** Lloyd rounds for the TRAINED-centroid stored-index serve gate
    * (q_ann_trained_serve) — the coarse-IVF analog of
    * [[PqTrainGateIters]], fixed and small so the oracle unrolls the
    * identical iterations as chained CTEs. Declared BEFORE `all`
    * (oracle interpolation). */
  val IvfTrainGateIters = 2

  /** ADC shortlist size for the two-stage rerank gate query: the
    * compressed-domain search overfetches RerankShortlist candidates,
    * then exact cosine re-scores only those. Declared BEFORE `all`
    * (oracle interpolation). */
  val RerankShortlist = 10

  /** Per-cell outlier report size for [[all]]'s q_embed_outliers.
    * Declared BEFORE `all` (oracle interpolation). */
  val OutlierK = 5

  /** Matryoshka prefix length (Kusupati et al., NeurIPS'22): MRL-style
    * embeddings order information by dimension, so the first MrlDim
    * dims alone support a cheap first-pass ranking. Half the gate's
    * 64-dim vectors. Declared BEFORE `all` (oracle interpolation). */
  val MrlDim = 32

  /** Cross-score corpus (vec_id, embedding) against broadcast probes
    * (query_id, qv): one row per (query, vector) pair with sequential
    * double-precision cosine. */
  def cosineScores(corpus: DataFrame, probes: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(probes))
      .select(col("query_id"), col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("qv"), col("embedding")).as("cos"))

  /** Exact top-k neighbors per probe (excluding self-matches).
    *
    * The k-cut is the bounded [[graft.functions.TopKAgg]] —
    * NOT a `row_number` window: a window partitioned by query_id
    * would shuffle EVERY scored (query, vector) row into |queries|
    * reducers (the whole corpus × probe fanout through one
    * exchange), where the aggregator ships k-row digests per
    * (partition, query) and merges them — at 100 TB the difference
    * between shuffling the scored corpus and shuffling
    * |queries|·k·partitions rows. Same rows, same (cos DESC, vec_id)
    * order, same ranks (the TopK spec pins aggregator ≡ window). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    graft.functions.TopK.perKey(
      cosineScores(corpus, probes)
        .filter(col("vec_id") =!= col("query_id")),
      "query_id", "cos", "vec_id", k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("sim"))

  /** Matryoshka two-stage audit: shortlist by cosine over the first
    * [[MrlDim]] dims only, then score the SHORTLIST at full dimension
    * and flag which full-dimension top-[[TopK]] neighbors the cheap
    * prefix ranking retained. The adaptive-retrieval serving shape
    * for MRL-trained embeddings: the prefix scan reads half the
    * bytes (a dim-pruned column at 100 TB), and full vectors are
    * touched only for O(shortlist) rows per query. */
  def matryoshkaTopK(corpus: DataFrame, probes: DataFrame,
      shortlist: Int, k: Int): DataFrame = {
    val s = corpus.sparkSession
    val tCorpus = corpus.select(col("vec_id"),
      slice(col("embedding"), 1, MrlDim).as("embedding"))
    val tProbes = probes.select(col("query_id"),
      slice(col("qv"), 1, MrlDim).as("qv"))
    // bounded TopK digest cut, not a per-query window — the prefix
    // scan is corpus-sized, the same argument as bruteForceTopK
    val cut = graft.functions.TopK.perKey(
      cosineScores(tCorpus, tProbes)
        .filter(col("vec_id") =!= col("query_id")),
      "query_id", "cos", "vec_id", shortlist)
      .select(col("query_id"), col("vec_id"), col("rnk"),
        col("cos").as("cos_t"))
    val fullTop = bruteForceTopK(corpus, probes, k)
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        lit(true).as("hit"))
    cut
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes), "query_id")
      .select(col("query_id"), col("vec_id"), col("rnk"), col("cos_t"),
        CosineSimilarity(s, col("qv"), col("embedding")).as("cos_f"))
      .join(fullTop, Seq("query_id", "vec_id"), "left_outer")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk").cast("int").as("rnk"),
        round(col("cos_t"), 6).as("sim_trunc"),
        round(col("cos_f"), 6).as("sim_full"),
        coalesce(col("hit"), lit(false)).as("in_full_topk"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors whose label DIFFERS from the
    * query's — the negatives that actually move a contrastive loss
    * (easy negatives are already far). Probes must carry
    * (query_id, qv, qlabel). Same broadcast-probe scoring shape as
    * [[bruteForceTopK]]: the label predicate runs before the window,
    * so rejected same-class rows never enter the per-query heap; at
    * 100 TB the scan side swaps to the IVF/PQ shortlist exactly like
    * the other searches. */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val s = corpus.sparkSession
    // bounded TopK digest cut (the bruteForceTopK argument); the cut
    // carries only (cos, vec_id), so the labels rejoin AFTER it —
    // a k×|queries|-row point lookup, not a corpus shuffle
    val scored = corpus.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        CosineSimilarity(s, col("qv"), col("embedding")).as("cos"))
    graft.functions.TopK.perKey(scored, "query_id", "cos", "vec_id", k)
      .join(corpus.select(col("vec_id"), col("label")), "vec_id")
      .join(broadcast(probes.select(col("query_id"), col("qlabel"))),
        "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), round(col("cos"), 6).as("sim"),
        col("qlabel").as("query_label"), col("label").as("neighbor_label"))
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
    * centroids must be (centroid_id, cv). This is the REFERENCE
    * window-form implementation the parity specs anchor on; the
    * production corpus passes (training, index build, search-side
    * cell tagging) run the map-side [[assignConst]]/[[assignWithSim]]
    * forms over collected centroid constants, which are spec-pinned
    * to return exactly this. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"),
        CosineSimilarity(corpus.sparkSession, col("cv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("cos"), 6).as("sim"))

  /** Oracle-CTE replica of the full IVFADC pipeline up to the scored
    * candidates — exposing `q(query_id, qv)` and `sc(query_id,
    * vec_id, adc)` — shared by the `q_sim_ivfpq` top-k cut and the
    * `q_sim_rerank` shortlist so the SQL definition of the index and
    * search cannot fork between them. */
  private def ivfpqScoredCtes: String = {
    val adcSum = (0 until PqSubspaces)
      .map(j => s"max(CASE WHEN dt.j = $j THEN dd END)")
      .mkString("\n       + ")
    val rSeedHi = ResidualSeedFrom + PqCentroids
    s"""c AS (SELECT vec_id AS centroid_id, embedding AS cv
       |      FROM embeddings WHERE vec_id < $NumCentroids),
       |ascored AS (SELECT e.vec_id, c.centroid_id,
       |              ${cosSql("c.cv", "e.embedding")} AS cos
       |            FROM c CROSS JOIN embeddings e),
       |cells AS (SELECT vec_id, centroid_id
       |          FROM (SELECT vec_id, centroid_id,
       |                       row_number() OVER (PARTITION BY vec_id
       |                                          ORDER BY cos DESC, centroid_id) AS rnk
       |                FROM ascored)
       |          WHERE rnk = 1),
       |r AS (SELECT e.vec_id, cells.centroid_id,
       |        list_transform(range(${PqSubspaces * PqSubDim}), i ->
       |          CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.cv[i+1] AS DOUBLE)) AS rv
       |      FROM embeddings e
       |      JOIN cells ON cells.vec_id = e.vec_id
       |      JOIN c ON c.centroid_id = cells.centroid_id),
       |sub AS (SELECT unnest(range($PqSubspaces)) AS j),
       |rcs AS (SELECT cid, j, cv2[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS csub
       |        FROM (SELECT vec_id AS cid, rv AS cv2 FROM r
       |              WHERE vec_id >= $ResidualSeedFrom AND vec_id < $rSeedHi)
       |        CROSS JOIN sub),
       |rev AS (SELECT vec_id, centroid_id, j,
       |          rv[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS esub
       |        FROM r CROSS JOIN sub),
       |rd AS (SELECT vec_id, centroid_id, j, cid,
       |         ${sqDistSql("esub", "csub")} AS d2
       |       FROM rev JOIN rcs USING (j)),
       |codes AS (SELECT vec_id, centroid_id, j, m['c'] AS code
       |          FROM (SELECT vec_id, centroid_id, j,
       |                       min({'d': d2, 'c': cid}) AS m
       |                FROM rd GROUP BY vec_id, centroid_id, j)),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $NumProbes),
       |pscored AS (SELECT query_id, qv, centroid_id, cv,
       |              ${cosSql("qv", "cv")} AS ccos
       |            FROM q CROSS JOIN c),
       |pc AS (SELECT query_id, centroid_id, qv, cv
       |       FROM (SELECT query_id, centroid_id, qv, cv,
       |                    row_number() OVER (PARTITION BY query_id
       |                                       ORDER BY ccos DESC, centroid_id) AS crnk
       |             FROM pscored)
       |       WHERE crnk <= $NumProbeCells),
       |qs AS (SELECT query_id, centroid_id, j,
       |         list_transform(range(${PqSubspaces * PqSubDim}), i ->
       |           CAST(qv[i+1] AS DOUBLE) - CAST(cv[i+1] AS DOUBLE))
       |           [j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS qsub
       |       FROM pc CROSS JOIN sub),
       |dt AS (SELECT query_id, centroid_id, j, cid,
       |         ${sqDistSql("qsub", "csub")} AS dd
       |       FROM qs JOIN rcs USING (j)),
       |sc AS (SELECT query_id, vec_id,
       |         $adcSum AS adc
       |       FROM codes JOIN dt ON dt.centroid_id = codes.centroid_id
       |                         AND dt.j = codes.j AND dt.cid = codes.code
       |       GROUP BY query_id, vec_id)""".stripMargin
  }

  /** ADC shortlist → exact rerank — see the `q_sim_rerank` QueryDef.
    * The shortlist fetches original vectors by id (point-lookup
    * join); probes broadcast; final cut is a bounded window. */
  def ivfPqRerank(e: DataFrame, centroids: DataFrame, probes: DataFrame,
      nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    val sl = ivfPqSearch(e, centroids, probes, nprobe, shortlist)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("adc_rnk"))
    sl
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        "neighbor_id")
      .join(broadcast(probes), "query_id")
      .select(col("query_id"), col("neighbor_id"), col("adc_rnk"),
        CosineSimilarity(e.sparkSession, col("qv"), col("nv")).as("cos"))
      .withColumn("final_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("final_rnk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("final_rnk").cast("int").as("final_rnk"),
        col("adc_rnk").cast("int").as("adc_rnk"),
        round(col("cos"), 6).as("sim"))
  }

  /** Per-label mean embedding, exploded to (label, dim, centroid,
    * n_members) — see the `q_label_centroids` QueryDef. Shared by the
    * prototype classifier (`q_label_predict`). */
  def labelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("centroid"),
        count(lit(1)).as("n_members"))

  /** kNN-vote label-noise screen — see the `q_label_noise` QueryDef.
    * Assignment carries (label, embedding) through so the cell-scoped
    * self-join needs no second corpus pass; the kNN cut and majority
    * election are bounded windows (≤ cell members, ≤ LabelNoiseK
    * votes per vector). */
  def labelNoise(e: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    // the SHARED assignment body (knnGraph/bitextMine's blocking
    // step), carrying the label through — not a re-implementation, so
    // a tie-break or assignment retune cannot desynchronize the
    // cell-scoped screens
    val assigned = cellMembers(e, centroids, carry = Seq("label"))
    val nbrs = assigned.select(col("vec_id").as("nbr"),
      col("label").as("nbr_label"), col("embedding").as("nv"),
      col("centroid_id"))
    val knn = assigned.join(nbrs, "centroid_id")
      .filter(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("label"), col("centroid_id"),
        col("nbr"), col("nbr_label"),
        CosineSimilarity(e.sparkSession, col("embedding"), col("nv")).as("cs"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("nbr"))))
      .filter(col("rnk") <= k)
    knn
      .groupBy(col("vec_id"), col("label"), col("centroid_id"), col("nbr_label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vrnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("n_votes").desc, col("nbr_label"))))
      .filter(col("vrnk") === 1)
      .select(col("vec_id"), col("label"), col("centroid_id"),
        col("nbr_label").as("maj_label"), col("n_votes"),
        (col("label") =!= col("nbr_label")).cast("int").as("noisy"))
  }

  /** Nearest-centroid cell assignment that CARRIES the embedding
    * through — the blocking step [[knnGraph]], [[bitextMine]] and
    * [[labelNoise]] share: one broadcast-centroid scan, argmax by
    * (cos desc, centroid_id), output (vec_id, embedding,
    * centroid_id) plus any `carry` columns a caller needs alongside
    * (labelNoise carries the label — one shared assignment rule, no
    * per-caller copy to drift on a tie-break retune). Map-side over
    * the collected centroid constants ([[assignConst]]'s comparator,
    * spec-pinned against the window form) — no k-fanout, no window
    * exchange: ONE scan-stage pass however large the corpus. */
  private def cellMembers(e: DataFrame, centroids: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    assignConst(e, collectCentroids(centroids),
      col("embedding") +: carry.map(col))
      .select(col("vec_id") +: col("embedding") +: col("centroid_id") +:
        carry.map(col): _*)

  /** Mutual-kNN graph over the embedding corpus, cell-blocked: each
    * vector's top-k cosine neighbors WITHIN its centroid cell, kept
    * only when the edge is reciprocal (b in a's top-k AND a in b's).
    * Emits each undirected edge once (a < b).
    *
    * The mutual-kNN graph is the standard input artifact for
    * graph-based corpus analysis — NN-Descent-style refinement,
    * community detection, and the [[DedupOps]] PageRank/star passes
    * all start from exactly this edge list. Scale: pair volume is
    * Σ|cell|² (never global n²) and inherits the SemDeDup hot-cell
    * sub-split treatment when a cell outgrows [[SemdedupMaxCell]];
    * the kNN cut is a bounded per-vector window inside the cell
    * partitioning. */
  def knnGraph(e: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    // spread() before the Σ|cell|² pair expansion (r21): the corpus
    // ships as one small parquet file, so the map-side cell assignment
    // inherits the scan's 2–3 splits and the cosine-dense pair
    // expansion + TopK partial runs on 2–3 of the session's cores
    // (the q_lsh_recall exact-J shape; same fix)
    val cells = DedupOps.spread(cellMembers(e, centroids))
    val scored = cells.join(
      cells.select(col("vec_id").as("nbr"), col("embedding").as("nv"),
        col("centroid_id")),
      "centroid_id")
      .filter(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("centroid_id"), col("nbr"),
        CosineSimilarity(e.sparkSession, col("embedding"), col("nv")).as("cs"))
    // bounded TopK digest cut, not a window: the window form shuffles
    // and sorts every one of the Σ|cell|² scored pairs to keep k per
    // vector; the aggregator carries at most k pairs per (task, key).
    // Same comparator (cs DESC, nbr ASC — spec-pinned equal to the
    // window); centroid_id rides the key (functionally dependent on
    // vec_id) so no join back to re-derive the cell. Pinned (the
    // persist form, NOT pinIter): the mutual check reads the n·k
    // digest TWICE (forward and reverse side), and unpinned each side
    // would re-run the whole pair fanout + cosine + agg. This is
    // straight-line two-consumer reuse — pinIter here would write a
    // reliable checkpoint under clusterSafe whose files only an
    // explicit unpin reclaims, and the returned plan stays lazy so no
    // caller can unpin it: every knnGraph call would leak checkpoint
    // files until application exit. pin's persist is ContextCleaner-
    // swept with the frame.
    val knn = graft.functions.TopK.perKey(
        scored, Seq("vec_id", "centroid_id"), "cs", "nbr", k)
      .select(col("vec_id"), col("centroid_id"), col("nbr"), col("cs"))
      .pinned
    knn.as("f")
      .join(knn.select(col("vec_id").as("r_vec"), col("nbr").as("r_nbr")),
        col("f.vec_id") === col("r_nbr") && col("f.nbr") === col("r_vec"))
      .filter(col("f.vec_id") < col("f.nbr"))
      .select(col("f.vec_id").as("a"), col("f.nbr").as("b"),
        round(col("f.cs"), 6).as("sim"), col("f.centroid_id").as("cell"))
  }

  /** NN-Descent kNN-graph CONSTRUCTION (Dong et al., WWW'11): start
    * from a deterministic pseudo-random neighbor list and iterate
    * "score my neighbors' neighbors, keep the best k" — each round,
    * every vector's candidate set is the 2-hop neighborhood of the
    * current graph taken over B(v) = out ∪ in neighbors, rescored by
    * exact cosine and cut back to k. No index, no cells: the graph
    * bootstraps ITSELF (measured here: recall vs brute-force kNN
    * 0.03 at the random init → 0.91 after 4 rounds at k=12 — the
    * complement of [[knnGraph]], whose cell blocking caps recall at
    * whatever the cells capture and whose 2-hops can never leave a
    * cell).
    *
    * Determinism: the init is a hash formula over dense vec_ids, each
    * round is a set-algebra + exact-cosine + (cs DESC, nbr) window —
    * so the FINAL GRAPH is identical on any partitioning and the
    * oracle unrolls the same rounds as chained CTEs.
    *
    * Scale: per round, candidate volume is Σ_v |B(v)|² ≤ n·(2k)²
    * (linear in n, never n²), produced by one self-join of the
    * (v, nbr) edge list on the middle vertex; embeddings enter only
    * through two id-equi-joins to score (bucketed vec_id layout makes
    * those exchange-free, the writeIvfIndex discipline); the k-cut is
    * a bounded per-vertex window. Round state is [[Materialize
    * .pinIter]]-pinned so round N's plan never nests round N-1's. */
  def nnDescent(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    val s = e.sparkSession
    val n = e.count() // bounded driver scalar: the init hash modulus
    val vecs = e.select(col("vec_id"), col("embedding"))
    def score(pairs: DataFrame): DataFrame =
      pairs
        .join(vecs.select(col("vec_id").as("v"), col("embedding").as("ev")),
          "v")
        .join(vecs.select(col("vec_id").as("nbr"),
          col("embedding").as("nv")), "nbr")
        .select(col("v"), col("nbr"),
          CosineSimilarity(s, col("ev"), col("nv")).as("cs"))
    // bounded TopK digest, not a window: each of the rounds+2 k-cuts
    // would otherwise shuffle and sort the full ≤ n·(2k)² candidate
    // volume; the digest ships k pairs per (task, v). Same comparator
    // (cs DESC, nbr ASC), spec-pinned equal to row_number — the
    // oracle's unrolled windows replay unchanged.
    def topK(scored: DataFrame): DataFrame =
      graft.functions.TopK.perKey(scored, "v", "cs", "nbr", k)
    val init = vecs
      .select(col("vec_id").as("v"),
        explode(sequence(lit(0L), lit(k + 1L))).as("r"))
      .select(col("v"),
        pmod(col("v") * NNDescentInitA + col("r") * NNDescentInitB + 1L,
          lit(n)).as("nbr"))
      .filter(col("v") =!= col("nbr"))
      // hash on v BEFORE the distinct: hashpartitioning(v) satisfies
      // the (v, nbr) dedup's clustering AND the digest cut's groupBy(v),
      // so one exchange serves the whole candidate→score→k-cut chain
      // (the per-round rewrite below, applied to the init too)
      .repartition(col("v")).distinct()
    // each round's pin KEEPS the digest's rnk column (4 bytes/row):
    // the final projection reads the LAST round's ranks directly
    // instead of re-aggregating the already-k-cut graph through one
    // more exchange + digest pass — topK of a topK output is the
    // identity on both rows and ranks (same (cs DESC, nbr) comparator
    // the spec pins), so the r20 final `topK(g)` job was pure rework.
    // NOT re-repartitioned (r21 measured negative: explicit
    // p-partition pins on the per-round candidate exchanges added an
    // exchange per round and regressed the gate 4.66→4.9 s best-of-3;
    // the rounds' wall cost is job/exchange machinery, not map-side
    // parallelism, so AQE's coalescing is the cheaper shape here).
    var g = Materialize.pinIter(topK(score(init)))
    // Per-round shuffle shape (rewritten r22, guide §2.4 — remove
    // shuffles outright): the former round ran FIVE exchanges —
    // b = (edges ∪ reverse).distinct() (1), the b ⋈ b self-join on
    // x.nbr = y.v (2, one per side), the candidate distinct (1) and
    // the k-cut's groupBy(v) (1) — each materialized as its own AQE
    // job, and this gate's wall is job-count × per-job floor (r21:
    // 31 jobs, taskTimeSum 4.4 s vs wall 4.1 s). Two observations
    // fold it to TWO exchanges per round:
    //  1. b is symmetric by construction, so the self-join's output
    //     is exactly ∪_m { (u, w) : u, w ∈ B(m) } with B(m) = out ∪
    //     in neighbors of m — ONE collect_set aggregation keyed on
    //     the middle vertex (the union's dedup rides the set for
    //     free) followed by a map-side double explode produces the
    //     identical pair set with no join and no pre-distinct.
    //  2. hashpartitioning(v) satisfies BOTH the candidate dedup's
    //     (v, nbr) clustering and the digest cut's groupBy(v), so
    //     one repartition(v) ahead of the distinct serves the whole
    //     score→k-cut tail (the embedding attach joins broadcast at
    //     gate scale and preserve the partitioning; at cluster scale
    //     they fall back to equi-join exchanges exactly as before).
    // Candidate SET, scoring expression and comparator are unchanged
    // — the oracle's unrolled CTE rounds replay identically.
    for (_ <- 1 to rounds) {
      val edges = g.select(col("v"), col("nbr"))
      val adj = edges
        .union(g.select(col("nbr").as("v"), col("v").as("nbr")))
        .groupBy(col("v")).agg(collect_set(col("nbr")).as("bs"))
      val cand = adj
        .select(explode(col("bs")).as("v"), col("bs"))
        .select(col("v"), explode(col("bs")).as("nbr"))
        .filter(col("v") =!= col("nbr"))
        .union(edges)
        .repartition(col("v")).distinct()
      val next = Materialize.pinIter(topK(score(cand)))
      Materialize.unpin(g)
      g = next
    }
    g.select(col("v").as("vec_id"), col("rnk").cast("int").as("rnk"),
      col("nbr"), round(col("cs"), 6).as("sim"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 §3):
    * between two sides of the corpus (here the deterministic vec_id
    * parity split standing in for two languages' encoder outputs),
    * score every same-cell cross pair by cosine normalized by the
    * mean of both endpoints' k-NN neighborhoods —
    * margin = cos(x,y) / ((meanK_fwd(x) + meanK_bwd(y)) / 2) —
    * which suppresses hub vectors that are near everything. Emits
    * each A-side vector's best-margin match with a mutual-best flag
    * (the pair each side elects the other — the high-precision mining
    * rule).
    *
    * Determinism: the k-NN means fold in (cos, id)-sorted order on
    * both engines (sort_array + sequential aggregate here, list(...
    * ORDER BY) + list_sum in the oracle), so no float sum-order
    * divergence; zero/negative denominators are filtered identically
    * before the division. Scale: pairs are cell-blocked (Σ|Acell|·
    * |Bcell|), the neighborhood means are bounded k-row folds, and
    * both elections are per-key windows over the pair set — corpus
    * text and full embeddings never shuffle, only (id, cell, cos)
    * triples. */
  def bitextMine(e: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    // NOT spread (r21 interleaved A/B: 1.48→1.78 s regression — the
    // A/B-side split + margin windows downstream re-exchange anyway,
    // so the extra round-robin only added an exchange; contrast
    // knnGraph, whose spread feeds the pair expansion directly)
    val cells = cellMembers(e, centroids)
    val aSide = cells.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("av"),
        col("centroid_id"))
    val bSide = cells.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("bv"),
        col("centroid_id"))
    val pairs = aSide.join(bSide, "centroid_id")
      .select(col("a_id"), col("b_id"),
        CosineSimilarity(e.sparkSession, col("av"), col("bv")).as("cos"))
      .pinned
    def nbrMean(idCol: String, otherCol: String, out: String): DataFrame =
      pairs
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("cos").desc, col(otherCol))))
        .filter(col("rnk") <= k)
        .groupBy(col(idCol))
        .agg(
          sort_array(collect_list(struct(col("cos"), col(otherCol)))).as("lst"),
          count(lit(1)).as("n"))
        .select(col(idCol),
          (aggregate(col("lst"), lit(0.0),
            (acc, x) => acc + x.getField("cos")) / col("n").cast("double"))
            .as(out))
    val margins = pairs
      .join(nbrMean("a_id", "b_id", "fmean"), "a_id")
      .join(nbrMean("b_id", "a_id", "bmean"), "b_id")
      .filter(col("fmean") + col("bmean") > 0)
      .select(col("a_id"), col("b_id"), col("cos"),
        (col("cos") / ((col("fmean") + col("bmean")) / 2)).as("margin"))
      .pinned
    val bestA = margins
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("a_id"))
          .orderBy(col("margin").desc, col("b_id"))))
      .filter(col("rn") === 1)
    val bestB = margins
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("b_id"))
          .orderBy(col("margin").desc, col("a_id"))))
      .filter(col("rn") === 1)
      .select(col("a_id").as("r_a"), col("b_id").as("r_b"))
    bestA
      .join(bestB,
        col("a_id") === col("r_a") && col("b_id") === col("r_b"), "left")
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"),
        round(col("margin"), 6).as("margin"),
        col("r_a").isNotNull.as("is_mutual"))
  }

  /** IVF index-health report: per-cell population, integer load
    * percentage against the uniform ideal (100 = perfectly
    * balanced), and the assignment-quality envelope (min/max member
    * similarity to the owning centroid). This is the retrain trigger
    * for an IVF/IVFADC index: a hot cell makes every probe that
    * touches it scan a long posting list, a starved cell wastes
    * nprobe budget, and a falling min_sim says the centroid no
    * longer represents its members — re-run [[ivfTrain]] when the
    * report degrades.
    *
    * Scale: assignment is the existing broadcast-centroid scan; the
    * report adds ONE groupBy on centroid_id (k rows out). Every
    * vector lands in exactly one cell, so n_total and k are BOTH
    * derivable from the k-row aggregate (sum/count over a global
    * window on k rows — a constant-size single partition, never a
    * second corpus pass). load_pct uses the exact-integer
    * floor((n_vecs*k*100)/n_total) so both engines agree
    * bit-for-bit (the operands are exact in double far below 2^53). */
  def ivfBalance(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // start from the CENTROIDS, not the assignment: a starved cell
    // that captured nothing must appear as an explicit zero row —
    // the exact situation the health report exists to surface
    val perCell = centroids.select(col("centroid_id"))
      .join(
        assignWithSim(corpus, collectCentroids(centroids),
          col("embedding"))
          .groupBy(col("centroid_id"))
          .agg(count(lit(1)).as("nv"),
            min(col("sim")).as("min_sim"), max(col("sim")).as("max_sim")),
        Seq("centroid_id"), "left_outer")
      .select(col("centroid_id"), coalesce(col("nv"), lit(0L)).as("nv"),
        col("min_sim"), col("max_sim"))
    val all = BoundedWindow.all // k rows total — constant-size
    perCell.select(col("centroid_id"), col("nv").as("n_vecs"),
      floor(col("nv") * count(lit(1)).over(all) * 100 /
        sum(col("nv")).over(all)).cast("bigint").as("load_pct"),
      col("min_sim"), col("max_sim"))
  }

  /** IVF centroid training: k-means (Lloyd) iterations with strided
    * seeds taken by RANK over the vec_id order (ranks 0, stride, …,
    * (k−1)·stride — spread across the corpus; first-k seeding
    * collapses when early rows share a cluster). Rank-based seeding
    * works on sparse or offset id spaces where raw `vec_id % stride`
    * could select fewer than k rows and silently train a degenerate
    * codebook; the dense 1..n rank guarantees exactly k seeds
    * whenever n ≥ k (fail-loud `require` otherwise, plus a
    * seed-count guard). Each iteration is one cross-score pass +
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
    *
    * NOTE: this is an offline TRAINING utility, not a per-query path —
    * the dimension/count probes and per-iteration checkpoints do a
    * handful of driver round-trips by design (once per index build).
    */
  def ivfTrain(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    ivfLloyd(corpus, k, iters, c => avg(c))

  /** [[ivfTrain]] with per-iteration centroid QUANTIZATION (6-dp
    * rounded means, then the float cast both variants share) — the
    * [[pqTrainQuantized]] move applied to the coarse IVF codebook:
    * both engines compute means of the SAME member sets from the SAME
    * float-quantized centroids, so the only cross-engine freedom
    * (summation order inside avg(), ~1e-15) is absorbed by the
    * rounding and the oracle can replay the training loop exactly.
    * Behind the q_ann_trained_serve gate. */
  def ivfTrainQuantized(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    ivfLloyd(corpus, k, iters, c => round(avg(c), 6))

  /** Rank-strided Lloyd seed selection — ONE rule for the IVF and PQ
    * trainings: dense SurrogateIds rank over vec_id, keep ranks
    * 0, stride, …, (k−1)·stride with stride = max(1, n/k). Dense
    * ranks exist by construction, so exactly k seeds come back;
    * `cid` is the seed ordinal (PQ keys its codebook on it, IVF
    * drops it). Factored so a seeding retune or sparse-rank guard
    * cannot be applied to one training and not the other. */
  private def stridedSeedIds(e: DataFrame, n: Long, k: Int): DataFrame = {
    val stride = math.max(1L, n / k)
    graft.imdb.SurrogateIds.assignLong(
        e.select(col("vec_id")), "_rnk", Seq(col("vec_id")))
      .filter((col("_rnk") - 1) % stride === 0 &&
        col("_rnk") - 1 < stride * k)
      .select(col("vec_id"),
        ((col("_rnk") - 1) / stride).cast("int").as("cid"))
  }

  private def ivfLloyd(corpus: DataFrame, k: Int, iters: Int,
      meanOf: Column => Column): DataFrame = {
    val s = corpus.sparkSession
    // ONE bounded job for both training constants (r22, guide §5 —
    // the dim probe and the count were separate sequential 1-task
    // jobs in a gate whose wall is job-count × per-job floor). max()
    // over per-row sizes replaces the old limit(1) pick: embeddings
    // are fixed-width per corpus (TablesSpec pins the type), so any
    // row's size — max included — is THE dimension, exactly as the
    // arbitrary first row was.
    val nd = corpus.agg(count(lit(1)).as("n"),
      max(size(col("embedding"))).as("d")).head()
    val n = nd.getLong(0)
    require(n > 0, "ivfTrain: empty corpus")
    val dim = nd.getInt(1)
    require(n >= k, s"ivfTrain: corpus has $n vectors, need at least k=$k")
    // The k×dim centroid set is index GEOMETRY, not data — it lives
    // driver-side for the whole loop (the MLlib-KMeans shape). Each
    // iteration is then exactly ONE distributed job: a map-side
    // assignment over the broadcast constants carrying the vector
    // along (no corpus × k window shuffle, no self-join to reattach
    // the embedding) into a k×partitions partial agg whose k result
    // rows are collected. The former frame-per-iteration form paid
    // two more jobs per iteration (a centroid collect plus a
    // join-with-previous materialization) to keep k rows in a
    // DataFrame between iterations. Output is ivfAssign's exactly
    // (spec-pinned comparator).
    // seed selection + collect inside a SCOPED pin release: once the
    // seeds are driver constants, the stamped-frame pin behind the
    // rank assignment is dead weight (one leaked cache entry per
    // training call under clusterSafe); the scope cannot touch a
    // sibling computation's still-lazy pins
    var cents: Seq[(Long, Array[Float])] =
      graft.imdb.SurrogateIds.withScopedPins {
        val seedIds = stridedSeedIds(corpus, n, k).select(col("vec_id"))
        collectCentroids(
          corpus.join(broadcast(seedIds), "vec_id")
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("cv")))
      }
    require(cents.size == k,
      s"ivfTrain: rank-strided seeding selected ${cents.size} of $k seeds")
    (0 until iters).foreach { _ =>
      val assigned = assignConst(corpus, cents,
        Seq(col("embedding").cast("array<double>").as("v")))
      val dimCols = (0 until dim).map(i =>
        meanOf(element_at(col("v"), i + 1)).as(s"d$i"))
      val got = assigned.groupBy(col("centroid_id"))
        .agg(dimCols.head, dimCols.tail: _*)
        .select(col("centroid_id"),
          array((0 until dim).map(i => col(s"d$i")): _*)
            .cast("array<float>").as("new_cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[java.lang.Float](1))).toMap
      // empty/degenerate cells keep their previous centroid — the
      // same left-to-right sum-of-|x|>0 test the frame form ran
      // (aggregate(transform(new_cv, abs), 0.0, +)): abs on the
      // float is exact, the fold promotes to double identically,
      // and a NaN sum fails >0 in both, keeping the previous value.
      // Collected as BOXED floats with an explicit null-element check
      // first: the frame form's null-propagating sum also kept the
      // previous centroid when a dimension's inputs were all null,
      // but a driver-side unbox (getSeq[Float]) would silently turn
      // that null into 0.0f and fabricate a corrupted centroid.
      cents = cents.map { case (id, prev) =>
        got.get(id) match {
          case Some(nv)
              if !nv.contains(null) && nv.foldLeft(0.0)(
                (acc, x) => acc + math.abs(x.toDouble)) > 0 =>
            (id, nv.map(_.floatValue).toArray)
          case _ => (id, prev)
        }
      }
    }
    // rebuild the k-row frame callers expect (bounded driver material;
    // every consumer either collects it or broadcast-joins it)
    import s.implicits._
    cents.toDF("centroid_id", "cv")
  }

  /** IVF probe search: score each query only against vectors whose
    * cell is among the query's nprobe nearest centroids. Same output
    * shape as [[bruteForceTopK]] so recall is directly comparable.
    * Both the probe-cell ranking and the corpus cell tagging are
    * map-side passes over the collected centroid constants
    * ([[annSearchStored]]'s shape with the index computed inline):
    * the corpus is touched by ONE scan-stage pass with no window
    * shuffle and no self-join to reattach the vector. */
  def ivfSearch(
      corpus: DataFrame, centroids: DataFrame, probes: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val s = corpus.sparkSession
    val centConst = collectCentroids(centroids)
    val probeCells = probes
      .select(col("query_id"), col("qv"),
        explode(nearestCellsConst(s, centConst, nprobe)).as("pc"))
      .select(col("query_id"), col("qv"),
        col("pc.centroid_id").as("probe_centroid"))
    val candidates = assignConst(corpus, centConst, Seq(col("embedding")))
      .join(broadcast(probeCells), col("centroid_id") === col("probe_centroid"))
      .filter(col("vec_id") =!= col("query_id"))
    // bounded TopK digest cut — the candidate set is a corpus
    // fraction (the probed cells), the bruteForceTopK argument
    graft.functions.TopK.perKey(
      candidates.select(col("query_id"), col("vec_id"),
        CosineSimilarity(corpus.sparkSession, col("qv"), col("embedding"))
          .as("cos")),
      "query_id", "cos", "vec_id", k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("sim"))
  }

  /** Measured IVF recall-vs-nprobe curve: for every probe depth
    * 1..maxProbe, recall@k of the nprobe-limited search against the
    * brute-force top-k — the dial a deployment turns to trade scan
    * fraction for recall, MEASURED on the index's own data rather
    * than assumed (the ANN twin of [[DedupOps]]' LSH S-curve).
    *
    * One scored table serves every depth: each (query, corpus) pair
    * carries its cell's probe rank for that query, so depth d's
    * result set is just `cell_rank <= d` + the per-query top-k window
    * — the corpus is scanned ONCE for the whole curve, not once per
    * depth, and the spec pins each depth's rows to an independent
    * [[ivfSearch]] run. Recall is exact-integer (hits·100 div
    * relevant) so both engines agree bit for bit. */
  def ivfRecallCurve(e: DataFrame, centroids: DataFrame, k: Int,
      maxProbe: Int): DataFrame = {
    val s = e.sparkSession
    val probes = e.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val centConst = collectCentroids(centroids)
    // full cell ranking per probe (crnk over ALL cells, not a top-n
    // cut): posexplode of the sorted const array — pos is exactly the
    // window form's row_number − 1 (same comparator, spec-pinned)
    val probeRanks = probes
      .select(col("query_id"),
        posexplode(nearestCellsConst(s, centConst, centConst.size)))
      .select(col("query_id"), col("col.centroid_id").as("centroid_id"),
        (col("pos") + 1).cast("int").as("crnk"))
    val scored = assignConst(e, centConst, Seq(col("embedding")))
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("centroid_id"),
        CosineSimilarity(s, col("qv"), col("embedding")).as("cos"))
      .join(broadcast(probeRanks), Seq("query_id", "centroid_id"))
      .pinned
    def topk(d: DataFrame): DataFrame = graft.functions.TopK.perKey(
      d.select(col("query_id"), col("cos"), col("vec_id")),
      "query_id", "cos", "vec_id", k)
      .select(col("query_id"), col("vec_id"))
    val bf = topk(scored).pinned
    val nRel = bf.agg(count(lit(1)).as("n_relevant"))
    val runs = (1 to maxProbe).map(np =>
      topk(scored.filter(col("crnk") <= np))
        .select(lit(np).cast("int").as("nprobe"), col("query_id"),
          col("vec_id")))
      .reduce(_ union _)
    runs
      .join(bf.withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .crossJoin(broadcast(nRel))
      .select(col("nprobe"), col("n_returned"), col("n_hits"),
        expr("n_hits * 100 DIV n_relevant").as("recall_pct"))
  }

  /** (vec_id, band, bucket) sign-bit LSH bands for near-dup blocking:
    * band `b` hashes dims [b·bits, (b+1)·bits) into a `bits`-bit
    * bucket. Pure map-side work; the bucket is the only shuffle key
    * downstream. */
  def signBands(emb: DataFrame, bands: Int, bits: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val bucket = (0 until bits)
        .map(j => when(element_at(col("embedding"), b * bits + j + 1) > 0f,
          lit(1 << j)).otherwise(lit(0)))
        .reduce(_ + _)
      struct(lit(b).as("band"), bucket.cast("int").as("bucket"))
    }
    emb.select(col("vec_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** Candidate near-dup pairs (a < b) from an EQUI-join on the
    * (band, bucket) sign-bit bands ([[signBands]]) — the blocking
    * step shared by pair scoring and cluster formation. Never an
    * all-pairs comparison: cost is quadratic only within a bucket
    * (n²·bands/2^bits pairs in expectation), and every join in the
    * plan is hash/sort-merge-able. */
  def embeddingCandidatePairs(emb: DataFrame): DataFrame = {
    val bands = signBands(emb, NearDupBands, NearDupBandBits)
      .pinned // self-joined: don't recompute buckets per side
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct() // a pair may collide in several bands
  }

  /** Embedding-cosine near-dup: the N most similar vector pairs among
    * the [[embeddingCandidatePairs]] candidates. Scoring joins the
    * embeddings back by vec_id, so vectors are shuffled once per
    * side, not N times. */
  def cosineNearDupTopN(emb: DataFrame, n: Int): DataFrame = {
    embeddingCandidatePairs(emb)
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("va")), "a")
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("vb")), "b")
      .select(col("a"), col("b"),
        CosineSimilarity(emb.sparkSession, col("va"), col("vb")).as("cos"))
      .orderBy(col("cos").desc, col("a"), col("b"))
      .limit(n)
      .select(col("a"), col("b"), round(col("cos"), 6).as("sim"))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Shared oracle CTEs: sign-bit bands → candidate pairs, the exact
    * SQL replica of [[signBands]] + [[embeddingCandidatePairs]] —
    * used by both the pair-scoring and cluster oracles so a band
    * retune can't desynchronize them. */
  private def bandCandSql: String = {
    val bands = (0 until NearDupBands).map(b =>
      s"""SELECT vec_id, $b AS band,
         |         CAST(list_sum(list_transform(range($NearDupBandBits),
         |           j -> CASE WHEN embedding[${b * NearDupBandBits} + j + 1] > 0
         |                THEN 2**j ELSE 0 END)) AS INTEGER) AS bucket
         |  FROM embeddings""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    s"""bands AS (
       |  $bands),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)""".stripMargin
  }

  /** DuckDB squared-L2 over list columns — sequential left-to-right
    * accumulation, bit-identical to [[sqDist]]. */
  private def sqDistSql(a: String, b: String): String =
    s"""list_sum(list_transform(range($PqSubDim), i ->
       |          (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE))
       |          * (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE))))""".stripMargin

  /** Shared PQ oracle CTEs — codebook, subvector explode, argmin
    * assignment — the exact SQL replica of [[pqCodebook]] +
    * [[pqAssign]], used by both the coding and ADC-search oracles so
    * a geometry retune can't desynchronize them. Exposes `mn`
    * (vec_id, j, m = {'d','c'}) and the building CTEs. */
  private def pqCtes: String =
    s"""cb AS (SELECT vec_id AS cid, embedding AS cv
       |            FROM embeddings WHERE vec_id < $PqCentroids),
       |sub AS (SELECT unnest(range($PqSubspaces)) AS j),
       |cs AS (SELECT cid, j, cv[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS csub
       |       FROM cb CROSS JOIN sub),
       |ev AS (SELECT vec_id, j, embedding[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS esub
       |       FROM embeddings CROSS JOIN sub),
       |d AS (SELECT vec_id, j, cid,
       |        ${sqDistSql("esub", "csub")} AS d2
       |      FROM ev JOIN cs USING (j)),
       |mn AS (SELECT vec_id, j, min({'d': d2, 'c': cid}) AS m
       |       FROM d GROUP BY vec_id, j)""".stripMargin

  /** Sign-bit word `w` (0 or 1) of `v`: dims 32w+1..32w+32 packed
    * into bits 0..31 of a BIGINT — 32-bit words because DuckDB
    * overflow-checks `1 << 63`, and two popcounts cost the same as
    * one. Shared by [[binaryQuantRerank]]'s corpus and query sides. */
  private def signWord(v: Column, w: Int): Column =
    (0 until 32).map { j =>
      when(element_at(v, w * 32 + j + 1) > 0f, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  /** q_sim_binary body: Hamming-shortlist over the packed sign words,
    * exact-cosine rerank of the shortlist. Output carries both phases
    * (ham + bq_rnk from the integer phase, final_rnk + sim from the
    * rerank) so the compression's ranking error is visible. */
  def binaryQuantRerank(corpus: DataFrame, probes: DataFrame,
      shortlist: Int, k: Int): DataFrame = {
    val s = corpus.sparkSession
    val packed = corpus.select(col("vec_id"),
      signWord(col("embedding"), 0).as("b0"),
      signWord(col("embedding"), 1).as("b1"))
    val qPacked = probes.select(col("query_id"),
      signWord(col("qv"), 0).as("q0"), signWord(col("qv"), 1).as("q1"))
    val ham = bit_count(col("b0").bitwiseXOR(col("q0"))) +
      bit_count(col("b1").bitwiseXOR(col("q1")))
    val cut = graft.functions.TopK.perKey(
      packed.crossJoin(broadcast(qPacked))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (-ham).cast("double").as("negham")),
      "query_id", "negham", "vec_id", shortlist)
      .select(col("query_id"), col("vec_id"),
        (-col("negham")).cast("int").as("ham"), col("rnk").as("bq_rnk"))
    graft.functions.TopK.perKey(
      cut
        .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(probes), "query_id")
        .select(col("query_id"), col("vec_id"),
          CosineSimilarity(s, col("qv"), col("embedding")).as("cos")),
      "query_id", "cos", "vec_id", k)
      .join(cut, Seq("query_id", "vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk").as("final_rnk"), col("bq_rnk"), col("ham"),
        round(col("cos"), 6).as("sim"))
  }

  /** Oracle for q_sim_binary: the same packing, popcounts, cuts and
    * rerank as chained CTEs — the shortlist phase is pure integer
    * arithmetic, so it hash-compares value-for-value. */
  private def binaryQuantSql: String = {
    def wordSql(v: String, w: Int): String =
      s"""CAST(list_sum(list_transform(range(32),
         |  j -> CASE WHEN $v[${w * 32} + j + 1] > 0
         |            THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)""".stripMargin
    s"""WITH p AS (SELECT vec_id, ${wordSql("embedding", 0)} AS b0,
       |                  ${wordSql("embedding", 1)} AS b1
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv,
       |             ${wordSql("embedding", 0)} AS q0,
       |             ${wordSql("embedding", 1)} AS q1
       |      FROM embeddings WHERE vec_id < $NumProbes),
       |h AS (SELECT q.query_id, p.vec_id,
       |             CAST(bit_count(xor(p.b0, q.q0))
       |                  + bit_count(xor(p.b1, q.q1)) AS INTEGER) AS ham
       |      FROM p CROSS JOIN q WHERE p.vec_id <> q.query_id),
       |cut AS (SELECT query_id, vec_id, ham, bq_rnk FROM (
       |          SELECT query_id, vec_id, ham,
       |                 CAST(row_number() OVER (PARTITION BY query_id
       |                        ORDER BY ham, vec_id) AS INTEGER) AS bq_rnk
       |          FROM h)
       |        WHERE bq_rnk <= $RerankShortlist),
       |r AS (SELECT c.query_id, c.vec_id, c.ham, c.bq_rnk,
       |             ${cosSql("q.qv", "e.embedding")} AS cos,
       |             CAST(row_number() OVER (PARTITION BY c.query_id
       |                    ORDER BY ${cosSql("q.qv", "e.embedding")}
       |                      DESC, c.vec_id) AS INTEGER) AS final_rnk
       |      FROM cut c JOIN embeddings e ON e.vec_id = c.vec_id
       |                 JOIN q ON q.query_id = c.query_id)
       |SELECT query_id, vec_id AS neighbor_id, final_rnk, bq_rnk, ham,
       |       round(cos, 6) AS sim
       |FROM r WHERE final_rnk <= $TopK""".stripMargin
  }

  /** RRF geometry: the standard k=60 dampener and the integer scale
    * that replaces 1/(60+rank) floats with exact 1e9 // (60+rank). */
  val RrfK = 60
  val RrfScale = 1000000000L

  /** The RRF combine over two ranked lists `(doc_id, lrnk)` /
    * `(doc_id, drnk)` — factored so the spec can plant an OVERLAPPING
    * pair of lists (the gate corpus's lexical and dense lists are
    * disjoint, so the both-lists sum path would otherwise go
    * unexercised). Docs in one list score on that list alone. */
  def rrfFuse(lex: DataFrame, dense: DataFrame): DataFrame = {
    val rrf =
      coalesce(expr(s"$RrfScale DIV ($RrfK + lrnk)").cast("long"), lit(0L)) +
        coalesce(expr(s"$RrfScale DIV ($RrfK + drnk)").cast("long"), lit(0L))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lrnk").as("lex_rank"),
        col("drnk").as("dense_rank"), rrf.as("rrf_x1e9"))
      .withColumn("rnk", row_number().over(
        BoundedWindow.orderBy(col("rrf_x1e9").desc, col("doc_id")))
        .cast("int"))
  }

  /** Oracle for q_sim_rrf: the shared BM25 lex CTEs + the dense
    * cosine list for probe 0 + the exact-integer fusion. */
  private def rrfSql: String = {
    val k = graft.operators.TextOps.Bm25TopK
    s"""${graft.operators.TextOps.bm25LexCtes},
       |den AS (SELECT vec_id AS doc_id, drnk FROM (
       |          SELECT e.vec_id,
       |                 CAST(row_number() OVER (
       |                        ORDER BY ${cosSql("q.qv", "e.embedding")}
       |                          DESC, e.vec_id)
       |                      AS INTEGER) AS drnk
       |          FROM embeddings e
       |          CROSS JOIN (SELECT embedding AS qv FROM embeddings
       |                      WHERE vec_id = 0) q
       |          WHERE e.vec_id <> 0)
       |        WHERE drnk <= $k),
       |f AS (SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
       |             l.lrnk, d.drnk
       |      FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id)
       |SELECT doc_id, lrnk AS lex_rank, drnk AS dense_rank,
       |       CAST(coalesce($RrfScale // ($RrfK + lrnk), 0)
       |            + coalesce($RrfScale // ($RrfK + drnk), 0)
       |            AS BIGINT) AS rrf_x1e9,
       |       CAST(row_number() OVER (ORDER BY rrf_x1e9 DESC, doc_id)
       |            AS INTEGER) AS rnk
       |FROM f""".stripMargin
  }

  val KCenterK = 8 // greedy k-center coreset size (incl. the seed)

  /** One incremental k-center coverage fold: update the running
    * max-sim-to-centers frame `best(vec_id, embedding, maxsim)` with
    * the round's NEW center — a ONE-ROW broadcast frame `(cv)`. Pure
    * map-side arithmetic (broadcast 1-row join + greatest), no
    * aggregate: the spec pins that shape, because re-aggregating
    * against ALL centers each round is the O(k²·n) trap this fold
    * exists to avoid. */
  def kCenterUpdate(best: DataFrame, newCenter: DataFrame): DataFrame =
    best.crossJoin(broadcast(newCenter))
      .select(col("vec_id"), col("embedding"),
        greatest(col("maxsim"),
          CosineSimilarity(best.sparkSession, col("cv"), col("embedding")))
          .as("maxsim"))

  /** Greedy k-center coreset selection (Gonzalez '85 2-approximation
    * — the facility-location shape data-efficient-training selection
    * uses): start from a seed, repeatedly add the vector FARTHEST
    * from the current centers (minimum max-cosine, vec_id
    * tie-break). The selected subset maximizes coverage diversity —
    * the "pick k representative documents" primitive for coreset
    * pruning and annotation budgeting.
    *
    * INCREMENTAL coverage maintenance: Gonzalez's loop only needs
    * each round's NEW center — max-sim to all centers is the running
    * max — so the per-vector coverage frame folds ONE 1-row
    * broadcast center per round ([[kCenterUpdate]]) and the argmin
    * is a 1-row bounded collect over it. Total work is O(k·n)
    * cosines; the recompute-all-centers-each-round formulation is
    * O(k²·n), a 500× overhead at the k≈1000 coreset sizes selection
    * actually runs at. max is exact on doubles, so the running fold
    * equals the all-centers max value for value and the unrolled
    * oracle is unchanged. Deterministic: exact cosine + id
    * tie-breaks. */
  def kCenterSelect(e: DataFrame, k: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    def centerVec(id: Long): DataFrame =
      e.filter(col("vec_id") === id).select(col("embedding").as("cv"))
    var picked = Vector((0, 0L, Option.empty[Double]))
    // seed coverage from center 0 (greatest(-Inf, cos) = cos), then
    // one fold per round; pinnedIter keeps lineage flat across rounds
    var best = kCenterUpdate(
      e.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), col("embedding"),
          lit(Double.NegativeInfinity).as("maxsim")),
      centerVec(0L)).pinnedIter
    for (r <- 1 until k) {
      val far = best.select(col("vec_id"), col("maxsim"))
        .orderBy(col("maxsim").asc, col("vec_id"))
        .limit(1).head() // bounded: ONE row per round
      val cid = far.getLong(0)
      picked = picked :+ ((r, cid, Some(far.getDouble(1))))
      if (r < k - 1) {
        val stepped = kCenterUpdate(
          best.filter(col("vec_id") =!= cid), centerVec(cid)).pinnedIter
        Materialize.unpin(best)
        best = stepped
      }
    }
    Materialize.unpin(best)
    picked.toDF("rnd", "center_id", "max_sim_raw")
      .select(col("rnd").cast("int").as("rnd"), col("center_id"),
        round(col("max_sim_raw"), 6).as("max_sim_to_prior"))
  }

  /** Oracle for q_select_kcenter: the greedy rounds unrolled —
    * materialized (each round's center set feeds the next). */
  private def kCenterSql: String = {
    val rounds = (1 until KCenterK).map { r =>
      s"""f$r AS MATERIALIZED (
         |  SELECT e.vec_id, max(${cosSql("e.embedding", "c.embedding")}) AS maxsim
         |  FROM embeddings e JOIN embeddings c
         |    ON c.vec_id IN (SELECT cid FROM c${r - 1})
         |  WHERE e.vec_id NOT IN (SELECT cid FROM c${r - 1})
         |  GROUP BY e.vec_id),
         |s$r AS MATERIALIZED (
         |  SELECT vec_id, maxsim FROM f$r ORDER BY maxsim, vec_id LIMIT 1),
         |c$r AS (SELECT cid FROM c${r - 1}
         |        UNION ALL SELECT vec_id FROM s$r)""".stripMargin
    }
    val outRows =
      s"""SELECT 0 AS rnd, CAST(0 AS BIGINT) AS center_id,
         |       CAST(NULL AS DOUBLE) AS max_sim_to_prior""".stripMargin +:
        (1 until KCenterK).map(r =>
          s"SELECT $r, vec_id, round(maxsim, 6) FROM s$r")
    s"""WITH c0 AS (SELECT CAST(0 AS BIGINT) AS cid),
       |${rounds.mkString(",\n")}
       |${outRows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  val LabelPropRounds = 3 // label-propagation spread rounds
  val LabelPropSeedMod = 5 // vec_id % 5 == 0 keep their true label

  /** Semi-supervised label propagation (Zhu & Ghahramani '02 shape)
    * over the mutual-kNN graph: 20% of vectors keep their label as
    * SEEDS, every unlabeled vector adopts the majority label of its
    * labeled neighbors (count DESC, label ASC tie-break), assigned
    * labels FREEZE — three rounds spread pseudo-labels outward along
    * the graph. The weak-supervision step that turns a small labeled
    * set into corpus-scale training labels. Per round: one edge join
    * against the labeled frontier + one (v, label) groupBy + a
    * per-vertex argmax window — graph-sized, never n²; round state
    * is pinIter-checkpointed. Everything is integer counts + string
    * tie-breaks, so the oracle unrolls the rounds bit-identically. */
  def labelPropagate(e: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val adj = edges.select(col("a").as("v"), col("b").as("n"))
      .union(edges.select(col("b").as("v"), col("a").as("n")))
    var lab = Materialize.pinIter(e.select(col("vec_id"),
      when(col("vec_id") % LabelPropSeedMod === 0, col("label")).as("lab"),
      when(col("vec_id") % LabelPropSeedMod === 0, lit("seed")).as("src")))
    for (r <- 1 to rounds) {
      val votes = adj
        .join(lab.filter(col("lab").isNotNull)
          .select(col("vec_id").as("n"), col("lab").as("nlab")), "n")
        .groupBy(col("v"), col("nlab")).agg(count(lit(1)).as("c"))
      // majority winner via min_by over (−c, nlab) — the same
      // (c DESC, nlab ASC) total order the row_number form ranked
      // ((v, nlab) is unique after the vote agg, so the minimum is
      // unique), as a partial-aggregable agg instead of a whole-votes
      // window sort per round
      val win = votes.groupBy(col("v"))
        .agg(min_by(col("nlab"),
          struct((-col("c")).as("nc"), col("nlab"))).as("nlab"))
        .select(col("v").as("vec_id"), col("nlab"))
      val next = Materialize.pinIter(
        lab.join(win, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("lab"), col("nlab")).as("lab"),
            coalesce(col("src"),
              when(col("nlab").isNotNull, lit(s"round$r"))).as("src")))
      Materialize.unpin(lab)
      lab = next
    }
    lab.join(e.select(col("vec_id"), col("label")), "vec_id")
      .select(col("vec_id"), col("lab").as("label_pred"),
        coalesce(col("src"), lit("none")).as("assigned"),
        coalesce(col("lab") === col("label"), lit(false)).as("is_correct"))
  }

  /** Oracle for q_label_propagate: the shared kNN edge CTEs + the
    * rounds unrolled (materialized — each round is referenced twice
    * by the next, the nn-descent inlining lesson). */
  private def labelPropagateSql: String = {
    val init =
      s"""adj AS (SELECT a AS v, b AS n FROM edges
         |        UNION ALL SELECT b AS v, a AS n FROM edges),
         |l0 AS MATERIALIZED (
         |  SELECT vec_id,
         |         CASE WHEN vec_id % $LabelPropSeedMod = 0 THEN label END AS lab,
         |         CASE WHEN vec_id % $LabelPropSeedMod = 0 THEN 'seed' END AS src
         |  FROM embeddings)""".stripMargin
    val rounds = (1 to LabelPropRounds).map { r =>
      s"""v$r AS (SELECT adj.v, l.lab AS nlab, count(*) AS c
         |        FROM adj JOIN l${r - 1} l
         |          ON l.vec_id = adj.n AND l.lab IS NOT NULL
         |        GROUP BY 1, 2),
         |w$r AS (SELECT v AS vec_id, nlab FROM (
         |          SELECT v, nlab,
         |                 row_number() OVER (PARTITION BY v
         |                                    ORDER BY c DESC, nlab) AS rk
         |          FROM v$r)
         |        WHERE rk = 1),
         |l$r AS MATERIALIZED (
         |  SELECT l.vec_id, coalesce(l.lab, w.nlab) AS lab,
         |         coalesce(l.src, CASE WHEN w.nlab IS NOT NULL
         |                              THEN 'round$r' END) AS src
         |  FROM l${r - 1} l LEFT JOIN w$r w USING (vec_id))""".stripMargin
    }
    s"""WITH $knnEdgeCtes,
       |${(init +: rounds).mkString(",\n")}
       |SELECT l.vec_id, l.lab AS label_pred,
       |       coalesce(l.src, 'none') AS assigned,
       |       coalesce(l.lab = e.label, FALSE) AS is_correct
       |FROM l$LabelPropRounds l JOIN embeddings e USING (vec_id)""".stripMargin
  }

  /** The cell-blocked mutual-kNN edge list as CTEs ending in
    * `edges(a, b, sim, cell)` — ONE SQL body shared by the
    * q_knn_graph oracle and the label-propagation oracle so the
    * graph definition cannot fork. */
  private def knnEdgeCtes: String =
    s"""c AS (SELECT vec_id AS centroid_id, embedding AS cv
       |      FROM embeddings WHERE vec_id < $NumCentroids),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.centroid_id,
       |         ${cosSql("c.cv", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN c),
       |cells AS (
       |  SELECT vec_id, embedding, centroid_id
       |  FROM (SELECT vec_id, embedding, centroid_id,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cos DESC, centroid_id) AS arnk
       |        FROM scored)
       |  WHERE arnk = 1),
       |p AS (
       |  SELECT x.vec_id, x.centroid_id, y.vec_id AS nbr,
       |         ${cosSql("x.embedding", "y.embedding")} AS cs
       |  FROM cells x JOIN cells y
       |    ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id),
       |knn AS (
       |  SELECT vec_id, centroid_id, nbr, cs
       |  FROM (SELECT vec_id, centroid_id, nbr, cs,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cs DESC, nbr) AS rnk
       |        FROM p)
       |  WHERE rnk <= $KnnGraphK),
       |edges AS (
       |  SELECT f.vec_id AS a, f.nbr AS b, round(f.cs, 6) AS sim,
       |         f.centroid_id AS cell
       |  FROM knn f JOIN knn r ON f.vec_id = r.nbr AND f.nbr = r.vec_id
       |  WHERE f.vec_id < f.nbr)""".stripMargin

  /** Oracle for q_knn_descent: the init hash plus every refinement
    * round unrolled as chained CTEs — UNION (not UNION ALL)
    * replicates the Spark side's distinct() on B(v) and the candidate
    * set, and each g_r re-ranks with the same (cs DESC, nbr) cut. */
  private def nnDescentSql: String = {
    val k = NNDescentK
    val init =
      s"""WITH i0 AS (
         |  SELECT DISTINCT v, nbr FROM (
         |    SELECT vec_id AS v,
         |           (vec_id * $NNDescentInitA + r * $NNDescentInitB + 1)
         |             % (SELECT count(*) FROM embeddings) AS nbr
         |    FROM embeddings, (SELECT unnest(range(${k + 2})) AS r))
         |  WHERE v <> nbr),
         |g0 AS MATERIALIZED (
         |  SELECT v, nbr, cs FROM (
         |    SELECT p.v, p.nbr, ${cosSql("ea.embedding", "eb.embedding")} AS cs,
         |           row_number() OVER (PARTITION BY p.v
         |                              ORDER BY cs DESC, p.nbr) AS rnk
         |    FROM i0 p JOIN embeddings ea ON ea.vec_id = p.v
         |              JOIN embeddings eb ON eb.vec_id = p.nbr)
         |  WHERE rnk <= $k)""".stripMargin
    val rounds = (1 to NNDescentRounds).map { r =>
      s"""b$r AS MATERIALIZED (SELECT v, nbr FROM g${r - 1}
         |        UNION SELECT nbr AS v, v AS nbr FROM g${r - 1}),
         |c$r AS MATERIALIZED (SELECT x.v, y.nbr FROM b$r x JOIN b$r y ON x.nbr = y.v
         |        WHERE x.v <> y.nbr
         |        UNION SELECT v, nbr FROM g${r - 1}),
         |g$r AS MATERIALIZED (
         |  SELECT v, nbr, cs FROM (
         |    SELECT p.v, p.nbr, ${cosSql("ea.embedding", "eb.embedding")} AS cs,
         |           row_number() OVER (PARTITION BY p.v
         |                              ORDER BY cs DESC, p.nbr) AS rnk
         |    FROM c$r p JOIN embeddings ea ON ea.vec_id = p.v
         |              JOIN embeddings eb ON eb.vec_id = p.nbr)
         |  WHERE rnk <= $k)""".stripMargin
    }
    (init +: rounds).mkString(",\n") +
      s"""
         |SELECT v AS vec_id,
         |       CAST(row_number() OVER (PARTITION BY v
         |                               ORDER BY cs DESC, nbr)
         |            AS INTEGER) AS rnk,
         |       nbr, round(cs, 6) AS sim
         |FROM g$NNDescentRounds""".stripMargin
  }

  /** DuckDB cosine over list columns `a`,`b` — sequential
    * left-to-right accumulation, bit-identical to
    * [[graft.functions.CosineSimilarity]]. */
  // zero-norm guard: [[graft.functions.CosineSimilarity]] returns
  // NULL on a zero norm, which sorts LAST in every DESC ranking;
  // DuckDB's bare 0/0 is NaN, which it sorts FIRST — so without the
  // nullif the oracle would crown a degenerate all-zero vector rank 1
  // of every top-k while Spark ranks it last (latent: the fixture has
  // no zero vectors, but the fork is one bad row away)
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(len($a)),
       |           i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))
       |         / nullif(sqrt(list_sum(list_transform(range(len($a)),
       |              i -> CAST($a[i+1] AS DOUBLE) * CAST($a[i+1] AS DOUBLE))))
       |          * sqrt(list_sum(list_transform(range(len($b)),
       |              i -> CAST($b[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))), 0))""".stripMargin

  private def gateProbes(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** The serve-family codebook, trained ONCE per corpus dir per JVM
    * and reused — production trains offline and serves many queries
    * against the standing codebook, so the SERVE gates (search,
    * stream serve, ingest assignment, recall curve) measure serving,
    * not retraining; q_ann_trained_serve deliberately re-trains
    * inline as the end-to-end train→build→serve composition gate.
    * Cache payload is the NumCentroids collected rows (bounded —
    * index geometry, the same constants the streaming serves
    * broadcast); the DataFrame view is a local relation of those
    * rows, broadcast wherever the trained frame was. */
  private val codebookCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, Seq[Float])]]()

  private def gateCodebookRows(
      s: SparkSession, dir: String): Seq[(Long, Seq[Float])] =
    codebookCache.computeIfAbsent(dir, _ =>
      // through collectCentroids for the fail-fast null guard — the
      // naive getSeq[Float] unbox would cache a fabricated 0.0f
      // coordinate every serve gate then ranks against
      collectCentroids(
        ivfTrainQuantized(emb(s, dir), NumCentroids, IvfTrainGateIters))
        .map { case (id, cv) => (id, cv.toSeq) })

  private[operators] def gateCodebook(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gateCodebookRows(s, dir).toDF("centroid_id", "cv")
  }

  private[operators] def gateCodebookConst(
      s: SparkSession, dir: String): Seq[(Long, Array[Float])] =
    gateCodebookRows(s, dir).map { case (id, v) => (id, v.toArray) }

  /** Oracle for q_stream_ivf_ingest: TRAINED-centroid assignment of
    * the "newly arriving" vec_id % [[IvfIngestMod]] slice — the same
    * cell-ranking shape as [[ivfTrainedServeSql]]'s `cells`,
    * restricted to the ingest slice, over the same trained codebook
    * the serve gates probe (the write and read halves of the serving
    * story share one geometry). */
  private[operators] def ivfIngestSql: String =
    s"""WITH $ivfTrainedCtes,
       |scored AS (
       |  SELECT e.vec_id, c.centroid_id,
       |         ${cosSql("cv", "e.embedding")}
       |         AS cos
       |  FROM c CROSS JOIN embeddings e
       |  WHERE e.vec_id % $IvfIngestMod = ${IvfIngestMod - 1})
       |SELECT vec_id, centroid_id, round(cos, 6) AS sim
       |FROM (SELECT vec_id, centroid_id, cos,
       |             row_number() OVER (PARTITION BY vec_id
       |                                ORDER BY cos DESC, centroid_id) AS rnk
       |      FROM scored)
       |WHERE rnk = 1""".stripMargin

  /** The assignment+probe+rank body of the IVF search oracle —
    * expects CTEs `c(centroid_id, cv)` and `q(query_id, qv)` in
    * scope, so the SQL definition of the search cannot fork across
    * the gates that bind different codebooks to it. */
  private def ivfSearchBodySql: String =
    s"""cell_scored AS (
       |  SELECT e.vec_id, c.centroid_id,
       |         ${cosSql("cv", "e.embedding")}
       |         AS cos
       |  FROM c CROSS JOIN embeddings e),
       |cells AS (
       |  SELECT vec_id, centroid_id
       |  FROM (SELECT vec_id, centroid_id,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cos DESC, centroid_id) AS rnk
       |        FROM cell_scored)
       |  WHERE rnk = 1),
       |probe_scored AS (
       |  SELECT q.query_id, c.centroid_id,
       |         ${cosSql("qv", "cv")}
       |         AS ccos
       |  FROM q CROSS JOIN c),
       |probes AS (
       |  SELECT query_id, centroid_id
       |  FROM (SELECT query_id, centroid_id,
       |               row_number() OVER (PARTITION BY query_id
       |                                  ORDER BY ccos DESC, centroid_id) AS crnk
       |        FROM probe_scored)
       |  WHERE crnk <= $NumProbeCells),
       |cand AS (
       |  SELECT p.query_id, e.vec_id,
       |         ${cosSql("q.qv", "e.embedding")}
       |         AS cos
       |  FROM probes p
       |  JOIN cells ce ON ce.centroid_id = p.centroid_id
       |  JOIN embeddings e ON e.vec_id = ce.vec_id
       |  JOIN q ON q.query_id = p.query_id
       |  WHERE e.vec_id <> p.query_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
       |       round(cos, 6) AS sim
       |FROM (SELECT query_id, vec_id, cos,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY cos DESC, vec_id) AS rnk
       |      FROM cand)
       |WHERE rnk <= $TopK""".stripMargin

  /** The [[ivfTrainQuantized]] Lloyd loop unrolled as chained CTEs
    * ending in the trained codebook `c(centroid_id, cv)` (the
    * q_pq_train move applied to the coarse IVF codebook —
    * rank-strided seeds, cosine argmax assignment with centroid_id
    * tie-break, 6-dp-rounded float-cast dim-wise means,
    * empty/degenerate cells keep their previous centroid). EVERY
    * IVF-family oracle binds its body to this one training chain, so
    * the gates all serve the geometry production would serve. */
  private def ivfTrainedCtes: String = {
    def iter(i: Int): String = {
      val prev = s"tc${i - 1}"
      s"""ta$i AS (
         |  SELECT e.vec_id, t.centroid_id,
         |         ${cosSql("t.cv", "e.embedding")}
         |         AS cos
         |  FROM $prev t CROSS JOIN embeddings e),
         |tb$i AS (
         |  SELECT vec_id, centroid_id
         |  FROM (SELECT vec_id, centroid_id,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS rn
         |        FROM ta$i) WHERE rn = 1),
         |tm$i AS (
         |  SELECT b.centroid_id, dims.di AS dim,
         |         CAST(round(avg(CAST(e.embedding[dims.di+1] AS DOUBLE)), 6) AS FLOAT) AS v
         |  FROM tb$i b JOIN embeddings e USING (vec_id),
         |       (SELECT unnest(range($EmbDim)) AS di) dims
         |  GROUP BY 1, 2),
         |tc$i AS (
         |  SELECT p.centroid_id, coalesce(mm.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN
         |    (SELECT centroid_id, list(v ORDER BY dim) AS cv
         |     FROM tm$i GROUP BY 1
         |     HAVING sum(abs(CAST(v AS DOUBLE))) > 0
         |        AND NOT isnan(sum(abs(CAST(v AS DOUBLE))))
         |        AND count(*) = count(v)) mm
         |    USING (centroid_id))""".stripMargin
    }
    s"""rk AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rnk
       |           FROM embeddings),
       |par AS (SELECT greatest(
       |          (SELECT count(*) FROM embeddings) // $NumCentroids, 1) AS stride),
       |tc0 AS (SELECT e.vec_id AS centroid_id, e.embedding AS cv
       |        FROM embeddings e JOIN rk USING (vec_id), par
       |        WHERE rk.rnk % par.stride = 0
       |          AND rk.rnk < par.stride * $NumCentroids),
       |${(1 to IvfTrainGateIters).map(iter).mkString(",\n")},
       |c AS (SELECT centroid_id, cv FROM tc$IvfTrainGateIters)""".stripMargin
  }

  /** ONE oracle for q_sim_ivf_search, q_ann_trained_serve,
    * q_stream_ann AND q_stream_ann_after_ingest: the unrolled
    * [[ivfTrainedCtes]] training feeding the shared search body. The
    * in-memory search, the stored-index serve, and both streaming
    * serve paths must land on the identical result, so all four
    * share this string the way the sessionization family shares its
    * window SQL — and every one of them serves the TRAINED codebook,
    * not the vec_id<k seeds. (For the after-ingest gate the "union
    * of base corpus + ingest slice" IS the full embeddings table, so
    * the same SQL is the read-your-writes oracle.) */
  private[operators] def ivfTrainedServeSql: String =
    s"""WITH $ivfTrainedCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $NumProbes),
       |$ivfSearchBodySql""".stripMargin

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

    // dedup family: embedding-cosine near-dup, top-20 pairs among
    // LSH-band candidates (the corpus is isotropic-random so a fixed
    // similarity threshold would be empty). The oracle replicates the
    // banding EXACTLY, so the approximate semantics still hash-match.
    QueryDef.sql(
      "q_dedup_embedding_cosine", {
        s"""WITH $bandCandSql,
           |scored AS (
           |  SELECT a, b,
           |         ${cosSql("ea.embedding", "eb.embedding")}
           |         AS cos
           |  FROM cand JOIN embeddings ea ON ea.vec_id = cand.a
           |            JOIN embeddings eb ON eb.vec_id = cand.b)
           |SELECT a, b, round(cos, 6) AS sim FROM scored
           |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin
      }) {
      (s, dir) => cosineNearDupTopN(emb(s, dir), 20)
    },

    // Embedding-level duplicate clusters: connected components over
    // the sign-band candidate graph — "which vectors are one
    // semantic duplicate group", the decision record an embedding
    // dedup pass stores. Blocking is the same zero-nested-loop
    // equi-join as above; component labeling reuses the alternating
    // star contraction (diameter-independent rounds). Oracle =
    // recursive CTE over the identical banding, so the approximate
    // blocking is replicated, not approximated.
    QueryDef.sql(
      "q_embed_dedup_clusters", {
        s"""WITH RECURSIVE $bandCandSql,
           |edges AS (SELECT a AS src, b AS dst FROM cand
           |          UNION ALL SELECT b, a FROM cand),
           |reach(src, dst) AS (
           |  SELECT vec_id, vec_id FROM embeddings
           |  UNION
           |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst)
           |SELECT src AS vec_id, min(dst) AS cluster_id
           |FROM reach GROUP BY src""".stripMargin
      }) {
      (s, dir) =>
        val labels = DedupOps.starComponents(embeddingCandidatePairs(emb(s, dir)))
          .withColumnRenamed("doc_id", "v2")
        emb(s, dir).select(col("vec_id"))
          .join(labels, col("vec_id") === col("v2"), "left_outer")
          .select(col("vec_id"),
            coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
    },

    // SemDeDup (Abbas et al., arXiv:2303.09540) shape: cluster the
    // corpus into cells (the gate's seed centroids), then look for
    // semantic duplicates ONLY within a cell — pairwise cost
    // collapses from n² global to Σ n_cell² (≈ n²/k), and the
    // per-cell work is a plain equi-join on centroid_id, never a
    // global nested loop. The isotropic gate corpus has no
    // fixed-threshold semantic dups (same reason
    // q_dedup_embedding_cosine ranks instead of thresholding), so
    // the hashed decision record is each cell's CLOSEST pair —
    // exactly the pair SemDeDup prunes first, keeping the lower id —
    // plus the cell population.
    QueryDef.sql(
      "q_semdedup",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |         ${cosSql("qv", "e.embedding")} AS cos
         |  FROM c CROSS JOIN embeddings e),
         |cells AS (
         |  SELECT vec_id, centroid_id
         |  FROM (SELECT vec_id, centroid_id,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS rnk
         |        FROM scored)
         |  WHERE rnk = 1),
         |sizes AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_members
         |          FROM cells GROUP BY centroid_id),
         |pairs AS (
         |  SELECT x.centroid_id AS centroid_id,
         |         x.vec_id AS keep_id, y.vec_id AS drop_id,
         |         ${cosSql("ex.embedding", "ey.embedding")} AS cos
         |  FROM cells x
         |  JOIN cells y ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
         |  JOIN embeddings ex ON ex.vec_id = x.vec_id
         |  JOIN embeddings ey ON ey.vec_id = y.vec_id)
         |SELECT centroid_id, n_members, keep_id, drop_id, round(cos, 6) AS sim
         |FROM (SELECT centroid_id, keep_id, drop_id, cos,
         |             row_number() OVER (PARTITION BY centroid_id
         |                                ORDER BY cos DESC, keep_id, drop_id) AS rnk
         |      FROM pairs) JOIN sizes USING (centroid_id)
         |WHERE rnk = 1""".stripMargin) {
      (s, dir) => semdedupClosestPairs(emb(s, dir), NumCentroids)
    },

    // Filtered ANN ("hybrid search"): top-k cosine neighbors among
    // only the vectors whose DOCUMENT passes a metadata predicate
    // (lang = 'en') — the retrieval shape RAG and curation pipelines
    // run ("nearest English docs to this one"). The predicate is a
    // semi-join on the shared id BEFORE scoring, so filtered-out
    // vectors never reach the distance computation; at 100 TB that
    // join co-partitions on the id while the probes broadcast.
    QueryDef.sql(
      "q_ann_filter",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NumProbes),
         |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         ${cosSql("qv", "e.embedding")} AS cos
         |  FROM q CROSS JOIN embeddings e
         |  JOIN en ON en.doc_id = e.vec_id)
         |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(cos, 6) AS sim
         |FROM (SELECT query_id, neighbor_id, cos,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM scored WHERE neighbor_id <> query_id)
         |WHERE rnk <= $TopK""".stripMargin) {
      (s, dir) =>
        val enIds = Tables(s, dir, "documents")
          .filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val corpus = emb(s, dir).join(enIds, Seq("vec_id"), "left_semi")
        val probes = emb(s, dir).filter(col("vec_id") < NumProbes)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        bruteForceTopK(corpus, probes, TopK)
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

    // Hard-negative mining: per query, the TopK most-similar vectors
    // of a DIFFERENT label — the contrastive-training batch builder.
    // Label filter before the window; broadcast probes; k-cut stays
    // TakeOrderedAndProject-shaped per query partition.
    QueryDef.sql(
      "q_sim_hard_negatives",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |                  label AS qlabel
         |           FROM embeddings WHERE vec_id < $NumProbes),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         q.qlabel AS query_label, e.label AS neighbor_label,
         |         ${cosSql("qv", "e.embedding")} AS cos
         |  FROM q JOIN embeddings e
         |    ON e.vec_id <> q.query_id AND e.label <> q.qlabel)
         |SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(cos, 6) AS sim, query_label, neighbor_label
         |FROM (SELECT query_id, neighbor_id, query_label, neighbor_label, cos,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM scored)
         |WHERE rnk <= $TopK""".stripMargin) {
      (s, dir) =>
        val probes = emb(s, dir).filter(col("vec_id") < NumProbes)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("label").as("qlabel"))
        hardNegatives(emb(s, dir), probes, TopK)
    },

    // Matryoshka two-stage audit: 32-dim-prefix shortlist of 10,
    // full-dim exact score on the shortlist only, membership flag
    // against the full-dim top-3 — measuring what the cheap prefix
    // ranking retains. The oracle slices the same prefixes and
    // replays both rankings with the shared sequential-cosine SQL.
    QueryDef.sql(
      "q_sim_matryoshka",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NumProbes),
         |tq AS (SELECT query_id, qv[1:$MrlDim] AS tqv FROM q),
         |te AS (SELECT vec_id, embedding[1:$MrlDim] AS temb FROM embeddings),
         |scored_t AS (
         |  SELECT tq.query_id, te.vec_id AS neighbor_id,
         |         ${cosSql("tqv", "temb")} AS cos_t
         |  FROM tq JOIN te ON te.vec_id <> tq.query_id),
         |cut AS (SELECT query_id, neighbor_id, cos_t,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY cos_t DESC, neighbor_id) AS rnk
         |        FROM scored_t),
         |scored_f AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         ${cosSql("qv", "e.embedding")} AS cos_f
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
         |fullcut AS (
         |  SELECT query_id, neighbor_id
         |  FROM (SELECT query_id, neighbor_id,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY cos_f DESC, neighbor_id) AS rnk
         |        FROM scored_f)
         |  WHERE rnk <= $TopK)
         |SELECT c.query_id, c.neighbor_id, CAST(c.rnk AS INTEGER) AS rnk,
         |       round(c.cos_t, 6) AS sim_trunc,
         |       round(f.cos_f, 6) AS sim_full,
         |       EXISTS (SELECT 1 FROM fullcut fc
         |               WHERE fc.query_id = c.query_id
         |                 AND fc.neighbor_id = c.neighbor_id) AS in_full_topk
         |FROM cut c
         |JOIN scored_f f ON f.query_id = c.query_id
         |               AND f.neighbor_id = c.neighbor_id
         |WHERE c.rnk <= $RerankShortlist""".stripMargin) {
      (s, dir) =>
        matryoshkaTopK(emb(s, dir), gateProbes(s, dir), RerankShortlist, TopK)
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
      // map-side over the collected seed constants — one corpus scan,
      // no window shuffle; output is ivfAssign's exactly (the oracle
      // above still replays the window form, so the hash pins the
      // const comparator against it corpus-wide)
      (s, dir) =>
        assignWithSim(emb(s, dir),
          collectCentroids(emb(s, dir).filter(col("vec_id") < NumCentroids)
            .select(col("vec_id").as("centroid_id"), col("embedding"))),
          col("embedding"))
    },

    // IVF probe search over the TRAINED centroids: each query scans
    // only its NumProbeCells nearest cells (nprobe/ncells of the
    // corpus). The oracle unrolls the same quantized Lloyd training
    // and replicates the cell assignment + probe selection + in-cell
    // ranking verbatim — the in-memory member of the four-way
    // ivfTrainedServeSql family (in-memory, stored serve, stream
    // serve, stream serve-after-ingest all on one codebook); recall
    // vs brute force is reported by q_ivf_recall_curve on the SAME
    // trained geometry.
    QueryDef.sql("q_sim_ivf_search", ivfTrainedServeSql) {
      (s, dir) =>
        ivfSearch(emb(s, dir), gateCodebook(s, dir), gateProbes(s, dir),
          NumProbeCells, TopK)
    },

    // The PRODUCTION index-build + serve composition: train the
    // coarse centroids with the quantized Lloyd loop (so the oracle
    // can replay training exactly — the q_pq_train move applied to
    // the coarse codebook), persist the full-precision index bucketed
    // by the TRAINED cells, and serve a probe batch against the
    // stored table through the same annSearchStored path q_stream_ann
    // uses — the stored-index member of the ivfTrainedServeSql
    // family (the whole serve family now runs this codebook). The
    // spec additionally reports trained-vs-seeded recall against the
    // exact brute-force top-k.
    QueryDef.sql("q_ann_trained_serve", ivfTrainedServeSql) {
      (s, dir) =>
        val trained = ivfTrainQuantized(emb(s, dir), NumCentroids,
          IvfTrainGateIters)
        writeIvfIndex(emb(s, dir), trained, "graft_ivf_trained", 8)
        val centConst = collectCentroids(trained)
        annSearchStored(gateProbes(s, dir), s.table("graft_ivf_trained"),
          centConst, NumProbeCells, TopK)
    },

    // Product quantization: per-subspace nearest-centroid codes + the
    // total reconstruction error — the compression half of IVF-PQ,
    // the standard 100 TB ANN layout (codes are PqSubspaces small
    // ints per vector vs 64 floats: ~64× less to scan at search
    // time). Codebook is a 16-row broadcast; coding is map-side.
    QueryDef.sql(
      "q_embed_pq", {
        val codeCols = (0 until PqSubspaces).map(j =>
          s"CAST(max(CASE WHEN j = $j THEN m['c'] END) AS INTEGER) AS code$j")
          .mkString(",\n       ")
        val errSum = (0 until PqSubspaces)
          .map(j => s"max(CASE WHEN j = $j THEN m['d'] END)")
          .mkString("\n           + ")
        s"""WITH $pqCtes
           |SELECT vec_id,
           |       $codeCols,
           |       round($errSum, 6) AS recon_err
           |FROM mn GROUP BY vec_id""".stripMargin
      }) {
      (s, dir) => pqCodes(emb(s, dir))
    },

    // PQ asymmetric-distance search (ADC): per-query distance table
    // to every codebook centroid (broadcast), then each coded vector
    // scored by m table lookups summed in fixed subspace order — the
    // search half of IVF-PQ, scanning codes instead of floats.
    QueryDef.sql(
      "q_sim_pq_adc", {
        val adcSum = (0 until PqSubspaces)
          .map(j => s"max(CASE WHEN dt.j = $j THEN dd END)")
          .mkString("\n       + ")
        s"""WITH $pqCtes,
         |codes AS (SELECT vec_id, j, m['c'] AS code FROM mn),
         |q AS (SELECT vec_id AS query_id, embedding AS qv
         |      FROM embeddings WHERE vec_id < $NumProbes),
         |qs AS (SELECT query_id, j, qv[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS qsub
         |       FROM q CROSS JOIN sub),
         |dt AS (SELECT query_id, j, cid,
         |         ${sqDistSql("qsub", "csub")} AS dd
         |       FROM qs JOIN cs USING (j)),
         |sc AS (SELECT query_id, vec_id,
         |         $adcSum AS adc
         |       FROM codes JOIN dt ON dt.j = codes.j AND dt.cid = codes.code
         |       GROUP BY query_id, vec_id)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(adc, 6) AS adc_dist
         |FROM (SELECT query_id, vec_id, adc,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY adc, vec_id) AS rnk
         |      FROM sc WHERE vec_id <> query_id)
         |WHERE rnk <= $TopK""".stripMargin
      }) {
      (s, dir) => pqAdcTopK(emb(s, dir), gateProbes(s, dir), TopK)
    },

    // Full IVFADC (Jégou et al. §V): residual PQ codes per IVF cell,
    // per-probed-cell distance tables, ADC over probed cells' codes
    // only — the billion-vector production ANN composition.
    QueryDef.sql(
      "q_sim_ivfpq",
      s"""WITH $ivfpqScoredCtes
         |SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(adc, 6) AS adc_dist
         |FROM (SELECT query_id, vec_id, adc,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY adc, vec_id) AS rnk
         |      FROM sc WHERE vec_id <> query_id)
         |WHERE rnk <= $TopK""".stripMargin) {
      (s, dir) =>
        val centroids = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        ivfPqSearch(emb(s, dir), centroids, gateProbes(s, dir),
          NumProbeCells, TopK)
    },

    // Two-stage retrieval: ADC shortlist → EXACT rerank — the
    // production serving pattern (Jégou §V.C: PQ narrows, exact
    // distances on the shortlist fix quantization error). The
    // shortlist (queries × RerankShortlist ids) joins back to the
    // original vectors BY ID — a point-lookup join against the stored
    // corpus, touching shortlist-many rows however large the corpus —
    // and the final cut is a bounded per-query window. Output carries
    // both ranks, so the reordering the exact stage performs (the
    // quantization error it recovered) is visible in the result.
    QueryDef.sql(
      "q_sim_rerank_ivf",
      s"""WITH $ivfpqScoredCtes,
         |sl AS (SELECT query_id, vec_id, rnk AS adc_rnk
         |       FROM (SELECT query_id, vec_id,
         |                    row_number() OVER (PARTITION BY query_id
         |                                       ORDER BY adc, vec_id) AS rnk
         |             FROM sc WHERE vec_id <> query_id)
         |       WHERE rnk <= $RerankShortlist),
         |rr AS (SELECT sl.query_id, sl.vec_id, sl.adc_rnk,
         |              ${cosSql("q.qv", "e.embedding")} AS cos
         |       FROM sl JOIN q ON q.query_id = sl.query_id
         |               JOIN embeddings e ON e.vec_id = sl.vec_id)
         |SELECT query_id, vec_id AS neighbor_id,
         |       CAST(rn AS INTEGER) AS final_rnk,
         |       CAST(adc_rnk AS INTEGER) AS adc_rnk, round(cos, 6) AS sim
         |FROM (SELECT query_id, vec_id, adc_rnk, cos,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY cos DESC, vec_id) AS rn
         |      FROM rr)
         |WHERE rn <= $TopK""".stripMargin) {
      (s, dir) =>
        val centroids = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        ivfPqRerank(emb(s, dir), centroids, gateProbes(s, dir),
          NumProbeCells, RerankShortlist, TopK)
    },

    // TRAINED-codebook gate: pqTrain's Lloyd loop itself, made
    // oracle-replicable by quantizing each iteration's centroid means
    // to 6 dp (both engines compute means of the SAME member sets from
    // the SAME quantized codebook, so the only cross-engine freedom —
    // summation order inside avg(), ~1e-15 — is absorbed by the
    // rounding). Seeds come from the dense two-phase rank, rounds are
    // fixed, and the oracle unrolls the identical iterations as
    // chained CTEs: assignment by sequential squared-L2 argmin with
    // cid tie-break, dim-wise mean, empty cells keep their centroid.
    // This pins the PRODUCTION training path — seeding, assignment,
    // update, convergence carry — not just a seeded stand-in.
    QueryDef.sql(
      "q_pq_train", {
        def iter(i: Int): String = {
          val prev = if (i == 1) "cb0" else s"cb${i - 1}"
          s"""a$i AS (
             |  SELECT ev.vec_id, ev.sub, ev.esub, c.cid,
             |         list_sum(list_transform(range($PqSubDim),
             |           j -> (ev.esub[j+1] - c.csub[j+1]) * (ev.esub[j+1] - c.csub[j+1]))) AS d2
             |  FROM ev JOIN $prev c USING (sub)),
             |b$i AS (
             |  SELECT vec_id, sub, esub, cid FROM (
             |    SELECT vec_id, sub, esub, cid,
             |           row_number() OVER (PARTITION BY vec_id, sub
             |                              ORDER BY d2, cid) AS rn
             |    FROM a$i) WHERE rn = 1),
             |m$i AS (
             |  SELECT sub, cid, dims.di AS dim, round(avg(esub[dims.di+1]), 6) AS v
             |  FROM b$i, (SELECT unnest(range($PqSubDim)) AS di) dims
             |  GROUP BY 1, 2, 3),
             |cb$i AS (
             |  SELECT p.sub, p.cid, coalesce(mm.csub, p.csub) AS csub
             |  FROM $prev p LEFT JOIN
             |    (SELECT sub, cid, list(v ORDER BY dim) AS csub
             |     FROM m$i GROUP BY 1, 2) mm USING (sub, cid))""".stripMargin
        }
        s"""WITH ev AS (
           |  SELECT e.vec_id, CAST(s.sub AS INTEGER) AS sub,
           |         list_transform(
           |           e.embedding[s.sub*$PqSubDim+1 : s.sub*$PqSubDim+$PqSubDim],
           |           x -> CAST(x AS DOUBLE)) AS esub
           |  FROM embeddings e,
           |       (SELECT unnest(range($PqSubspaces)) AS sub) s),
           |rk AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rnk
           |       FROM embeddings),
           |par AS (SELECT greatest(
           |          (SELECT count(*) FROM embeddings) // $PqCentroids, 1) AS stride),
           |seeds AS (SELECT rk.vec_id, CAST(rk.rnk // par.stride AS INTEGER) AS cid
           |          FROM rk, par
           |          WHERE rk.rnk % par.stride = 0
           |            AND rk.rnk < par.stride * $PqCentroids),
           |cb0 AS (SELECT ev.sub, s.cid, ev.esub AS csub
           |        FROM ev JOIN seeds s USING (vec_id)),
           |${(1 to PqTrainGateIters).map(iter).mkString(",\n")}
           |SELECT sub, cid, CAST(dims.di AS INTEGER) AS dim,
           |       csub[dims.di+1] AS v
           |FROM cb$PqTrainGateIters,
           |     (SELECT unnest(range($PqSubDim)) AS di) dims""".stripMargin
      }) {
      (s, dir) => pqTrainQuantized(emb(s, dir), PqCentroids, PqTrainGateIters)
    },

    // Two-stage ANN serving (shortlist + rerank): the ADC search
    // overfetches RerankShortlist candidates from the CODE table,
    // then exact cosine re-scores ONLY those — the standard
    // compressed-domain serving path (Jégou TPAMI'11 §IV-E): the
    // corpus is scanned as small ints, and the original floats are
    // fetched for queries×shortlist rows only. At 100 TB the
    // shortlist is a tiny broadcast against the id-partitioned
    // embedding store — the float fetch is a point-lookup join, never
    // a corpus scan. The oracle replicates shortlist membership and
    // the exact rerank verbatim.
    QueryDef.sql(
      "q_sim_rerank", {
        val adcSum = (0 until PqSubspaces)
          .map(j => s"max(CASE WHEN dt.j = $j THEN dd END)")
          .mkString("\n       + ")
        s"""WITH $pqCtes,
           |codes AS (SELECT vec_id, j, m['c'] AS code FROM mn),
           |q AS (SELECT vec_id AS query_id, embedding AS qv
           |      FROM embeddings WHERE vec_id < $NumProbes),
           |qs AS (SELECT query_id, j, qv[j*$PqSubDim+1 : j*$PqSubDim+$PqSubDim] AS qsub
           |       FROM q CROSS JOIN sub),
           |dt AS (SELECT query_id, j, cid,
           |         ${sqDistSql("qsub", "csub")} AS dd
           |       FROM qs JOIN cs USING (j)),
           |sc AS (SELECT query_id, vec_id,
           |         $adcSum AS adc
           |       FROM codes JOIN dt ON dt.j = codes.j AND dt.cid = codes.code
           |       GROUP BY query_id, vec_id),
           |short AS (
           |  SELECT query_id, vec_id
           |  FROM (SELECT query_id, vec_id,
           |               row_number() OVER (PARTITION BY query_id
           |                                  ORDER BY adc, vec_id) AS srnk
           |        FROM sc WHERE vec_id <> query_id)
           |  WHERE srnk <= $RerankShortlist),
           |rer AS (
           |  SELECT s.query_id, s.vec_id,
           |         ${cosSql("q.qv", "e.embedding")} AS cos
           |  FROM short s
           |  JOIN embeddings e ON e.vec_id = s.vec_id
           |  JOIN q ON q.query_id = s.query_id)
           |SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS INTEGER) AS rnk,
           |       round(cos, 6) AS sim
           |FROM (SELECT query_id, vec_id, cos,
           |             row_number() OVER (PARTITION BY query_id
           |                                ORDER BY cos DESC, vec_id) AS rnk
           |      FROM rer)
           |WHERE rnk <= $TopK""".stripMargin
      }) {
      (s, dir) =>
        val e = emb(s, dir)
        val probes = gateProbes(s, dir)
        val shortlist = pqAdcTopK(e, probes, RerankShortlist)
          .select(col("query_id"), col("neighbor_id"))
        val reranked = shortlist
          .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
            "neighbor_id")
          .join(broadcast(probes), "query_id")
          .select(col("query_id"), col("neighbor_id"),
            CosineSimilarity(s, col("qv"), col("embedding")).as("cos"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        reranked.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= TopK)
          .select(col("query_id"), col("neighbor_id"), col("rnk"),
            round(col("cos"), 6).as("sim"))
    },

    // Embedding outlier report: each vector's similarity to its
    // assigned cell centroid, bottom-OutlierK per cell — the "prune
    // the vectors that don't belong to their cluster" curation
    // decision (the complement of SemDeDup's closest-pair prune).
    // Ranking runs on the UNROUNDED cosine (bit-identical sequential
    // accumulation on both engines); only the reported sim is
    // rounded. The per-cell cut is a bounded window — at corpus scale
    // the same bounded-TopK aggregator as q_topk_per_key applies,
    // keeping per-cell state at O(k) instead of a full cell sort.
    QueryDef.sql(
      "q_embed_outliers",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |         ${cosSql("cv", "e.embedding")} AS cos
         |  FROM c CROSS JOIN embeddings e),
         |cells AS (
         |  SELECT vec_id, centroid_id, cos
         |  FROM (SELECT vec_id, centroid_id, cos,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS arnk
         |        FROM scored)
         |  WHERE arnk = 1)
         |SELECT centroid_id, vec_id, CAST(rnk AS INTEGER) AS rnk,
         |       round(cos, 6) AS sim
         |FROM (SELECT centroid_id, vec_id, cos,
         |             row_number() OVER (PARTITION BY centroid_id
         |                                ORDER BY cos ASC, vec_id) AS rnk
         |      FROM cells)
         |WHERE rnk <= $OutlierK""".stripMargin) {
      (s, dir) =>
        val e = emb(s, dir)
        // cell assignment map-side over the collected seed constants
        // (RAW cos kept — the bottom-k ranks on the unrounded score,
        // exactly like the oracle); the only window left is the
        // per-cell bottom-k, bounded by cell population
        val assigned = assignScored(e,
          collectCentroids(e.filter(col("vec_id") < NumCentroids)
            .select(col("vec_id").as("centroid_id"), col("embedding"))),
          col("embedding"))
        assigned.withColumn("rnk", row_number().over(
          Window.partitionBy(col("centroid_id"))
            .orderBy(col("cos").asc, col("vec_id"))))
          .filter(col("rnk") <= OutlierK)
          .select(col("centroid_id"), col("vec_id"), col("rnk"),
            round(col("cos"), 6).as("sim"))
    },

    // IVF index-health report: per-cell population, load vs the
    // uniform ideal, min/max member-to-centroid similarity — the
    // telemetry that decides when to re-run ivfTrain. One k-row
    // groupBy over the assignment + a one-row total broadcast.
    QueryDef.sql(
      "q_ivf_balance",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, c.centroid_id,
         |         ${cosSql("cv", "e.embedding")} AS cos
         |  FROM c CROSS JOIN embeddings e),
         |cells AS (
         |  SELECT vec_id, centroid_id, cos
         |  FROM (SELECT vec_id, centroid_id, cos,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS arnk
         |        FROM scored)
         |  WHERE arnk = 1),
         |agg AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS nv,
         |               min(round(cos, 6)) AS min_sim,
         |               max(round(cos, 6)) AS max_sim
         |        FROM cells GROUP BY centroid_id),
         |allc AS (SELECT c.centroid_id, coalesce(nv, 0) AS nv, min_sim, max_sim
         |         FROM c LEFT JOIN agg ON agg.centroid_id = c.centroid_id)
         |SELECT centroid_id, nv AS n_vecs,
         |       CAST(floor(nv * count(*) OVER () * 100.0 / sum(nv) OVER ())
         |            AS BIGINT) AS load_pct,
         |       min_sim, max_sim
         |FROM allc""".stripMargin) {
      (s, dir) =>
        val centroids = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        ivfBalance(emb(s, dir), centroids)
    },

    // Label-noise screen (Confident-Learning/cleanlab shape,
    // Northcutt et al. JAIR'21, by kNN vote): each vector's
    // LabelNoiseK nearest neighbors vote; a majority label that
    // disagrees with the vector's own label flags probable
    // mislabeling — the pre-training label audit for a classifier
    // corpus. Scale: neighbors are CELL-SCOPED — the self-join runs
    // inside IVF cells (the stored-index partitioning at production
    // scale), so pair volume is Σ|cell|², never corpus², and the
    // production path inherits the SemDeDup hot-cell sub-split for
    // skewed cells. Ordering freedoms are pinned: kNN by (cos desc,
    // nbr id), majority by (votes desc, label) — both engines replay
    // the identical election. Singleton cells have no neighbors and
    // drop out of the report on both sides.
    QueryDef.sql(
      "q_label_noise",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, e.label, e.embedding, c.centroid_id,
         |         ${cosSql("c.cv", "e.embedding")} AS cos
         |  FROM embeddings e CROSS JOIN c),
         |cells AS (
         |  SELECT vec_id, label, embedding, centroid_id
         |  FROM (SELECT vec_id, label, embedding, centroid_id,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS arnk
         |        FROM scored)
         |  WHERE arnk = 1),
         |p AS (
         |  SELECT x.vec_id, x.label, x.centroid_id,
         |         y.vec_id AS nbr, y.label AS nbr_label,
         |         ${cosSql("x.embedding", "y.embedding")} AS cs
         |  FROM cells x JOIN cells y
         |    ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id),
         |knn AS (
         |  SELECT vec_id, label, centroid_id, nbr_label
         |  FROM (SELECT vec_id, label, centroid_id, nbr_label,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cs DESC, nbr) AS rnk
         |        FROM p)
         |  WHERE rnk <= $LabelNoiseK),
         |v AS (SELECT vec_id, label, centroid_id, nbr_label,
         |             CAST(count(*) AS BIGINT) AS n_votes
         |      FROM knn GROUP BY 1, 2, 3, 4)
         |SELECT vec_id, label, centroid_id, nbr_label AS maj_label, n_votes,
         |       CAST(CASE WHEN label <> nbr_label THEN 1 ELSE 0 END
         |            AS INTEGER) AS noisy
         |FROM (SELECT vec_id, label, centroid_id, nbr_label, n_votes,
         |             row_number() OVER (PARTITION BY vec_id
         |                                ORDER BY n_votes DESC, nbr_label) AS vrnk
         |      FROM v)
         |WHERE vrnk = 1""".stripMargin) {
      (s, dir) =>
        val centroids = emb(s, dir).filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        labelNoise(emb(s, dir), centroids, LabelNoiseK)
    },

    // Per-label embedding centroids — the class prototypes behind
    // nearest-centroid classification, dataset cartography, and the
    // label-noise screen: mean vector per label, exploded to (label,
    // dim, centroid) rows. Scale: posexplode inflates rows ×dim, but
    // the groupBy is map-side combinable down to labels×dims cells
    // per partition (640 here), so only that bounded grid ever
    // shuffles — corpus size never appears in the exchange. The 6-dp
    // rounding is the house float-mean treatment (absorbs ~1e-15
    // summation-order freedom; q_pq_train's oracle pins the same
    // convention).
    QueryDef.sql(
      "q_label_centroids",
      """SELECT label, CAST(d.i AS INTEGER) AS dim,
        |       round(avg(CAST(e.embedding[d.i+1] AS DOUBLE)), 6) AS centroid,
        |       CAST(count(*) AS BIGINT) AS n_members
        |FROM embeddings e, unnest(range(len(e.embedding))) AS d(i)
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) => labelCentroids(emb(s, dir))
    },

    // Nearest-centroid classification audit — the confusion matrix of
    // the Rocchio/prototype classifier the centroids define: every
    // vector assigned to its most-cosine-similar label prototype,
    // then (true label, predicted label) counts. The pre-training
    // sanity check on a labeled corpus ("are the classes separable at
    // all, and which pairs bleed into each other") and the aggregate
    // view of q_label_noise's per-vector flags. Prototypes are the
    // 6-dp-quantized means CAST TO FLOAT on both engines (IEEE
    // round-to-nearest is deterministic), so the scoring inputs are
    // bit-identical cross-engine. Scale: the prototype table is
    // |labels| rows — built by the bounded-grid centroid aggregate,
    // broadcast everywhere; assignment is map-side scoring + one
    // labels²-bounded count. Corpus size appears in no exchange.
    QueryDef.sql(
      "q_label_predict",
      s"""WITH m AS (
         |  SELECT label, d.i AS dim,
         |         round(avg(CAST(e.embedding[d.i+1] AS DOUBLE)), 6) AS c
         |  FROM embeddings e, unnest(range(len(e.embedding))) AS d(i)
         |  GROUP BY 1, 2),
         |p AS (SELECT label AS proto_label,
         |             list(CAST(c AS FLOAT) ORDER BY dim) AS pv
         |      FROM m GROUP BY 1),
         |s AS (SELECT e.vec_id, e.label, p.proto_label,
         |             ${cosSql("p.pv", "e.embedding")} AS cos
         |      FROM embeddings e CROSS JOIN p),
         |a AS (SELECT vec_id, label, proto_label
         |      FROM (SELECT vec_id, label, proto_label,
         |                   row_number() OVER (PARTITION BY vec_id
         |                                      ORDER BY cos DESC, proto_label) AS rn
         |            FROM s)
         |      WHERE rn = 1)
         |SELECT label, proto_label AS pred_label,
         |       CAST(count(*) AS BIGINT) AS n_vecs,
         |       CAST(CASE WHEN label = proto_label THEN 1 ELSE 0 END
         |            AS INTEGER) AS is_correct
         |FROM a GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val e = emb(s, dir)
        val protos = labelCentroids(e)
          .groupBy(col("label").as("proto_label"))
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("centroid")))),
            f => f.getField("centroid").cast("float")).as("pv"))
        e.crossJoin(broadcast(protos))
          .select(col("vec_id"), col("label"), col("proto_label"),
            CosineSimilarity(s, col("pv"), col("embedding")).as("cos"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id"))
              .orderBy(col("cos").desc, col("proto_label"))))
          .filter(col("rn") === 1)
          .groupBy(col("label"), col("proto_label").as("pred_label"))
          .agg(count(lit(1)).as("n_vecs"))
          .withColumn("is_correct",
            (col("label") === col("pred_label")).cast("int"))
    },

    // Mutual-kNN graph, cell-blocked: each vector's top-K cosine
    // neighbors within its centroid cell, kept only when reciprocal,
    // one row per undirected edge. The input artifact for NN-Descent
    // refinement / community detection / the PageRank representative
    // signal. Pair volume Σ|cell|² (SemDeDup hot-cell treatment at
    // scale), kNN cut a bounded per-vector window, the mutual check
    // one self-equi-join on (a,b) edge ids — never text, never full
    // embeddings past the cell join.
    QueryDef.sql(
      "q_knn_graph",
      s"""WITH $knnEdgeCtes
         |SELECT a, b, sim, cell FROM edges""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      knnGraph(e,
        e.filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv")),
        KnnGraphK)
    },

    // Greedy k-center coreset selection (Gonzalez '85): the k most
    // coverage-diverse vectors, picked by iterated farthest-first —
    // the "representative subset" primitive for coreset pruning and
    // annotation budgeting. Each round scans once against the
    // broadcast center set; the max_sim_to_prior column is the
    // coverage radius shrinking round by round.
    QueryDef.sql("q_select_kcenter", kCenterSql) { (s, dir) =>
      kCenterSelect(emb(s, dir), KCenterK)
    },

    // Semi-supervised label propagation over the mutual-kNN graph
    // (Zhu & Ghahramani shape): 20% seeds spread pseudo-labels to
    // their graph neighborhoods over three frozen-majority rounds —
    // the weak-supervision step that turns a small labeled set into
    // corpus-scale training labels. Integer votes + string tie-breaks
    // only, so the unrolled oracle is bit-identical; graph CTEs are
    // SHARED with q_knn_graph so the two can't fork. Honesty note:
    // this corpus's labels are geometry-free (top-1-neighbor
    // same-label rate == chance, measured), so the gate's is_correct
    // rate is chance BY CONSTRUCTION — the gate pins the mechanism
    // (spread order, freezing, tie-breaks, coverage); the spec pins
    // the semantics on a planted signal graph where propagation is
    // exact.
    QueryDef.sql("q_label_propagate", labelPropagateSql) { (s, dir) =>
      val e = emb(s, dir)
      labelPropagate(e,
        knnGraph(e,
          e.filter(col("vec_id") < NumCentroids)
            .select(col("vec_id").as("centroid_id"),
              col("embedding").as("cv")),
          KnnGraphK),
        LabelPropRounds)
    },

    // NN-Descent kNN-graph construction (Dong et al., WWW'11): the
    // indexless complement of the cell-blocked q_knn_graph — a
    // deterministic pseudo-random init iterated 4 rounds of
    // "rescore my 2-hop neighborhood, keep the best k". Measured
    // recall vs brute force: 0.03 → 0.91. Everything is exact-
    // deterministic (hash init, exact cosine, (cs DESC, nbr)
    // windows), so the oracle unrolls the same rounds as chained
    // CTEs and the FINAL GRAPH hash-compares value-for-value. Per
    // round: candidates ≤ n·(2k)² from one edge-list self-join on
    // the middle vertex (linear in n, never n²), scoring via two
    // vec_id equi-joins, the k-cut a bounded window.
    QueryDef.sql("q_knn_descent", nnDescentSql) { (s, dir) =>
      nnDescent(emb(s, dir), NNDescentK, NNDescentRounds)
    },

    // BINARY quantization + Hamming shortlist + exact rerank — the
    // 1-bit-per-dimension compression modern vector stores ship as
    // their cheapest tier (32× smaller than float32; Hamming distance
    // approximates angle for mean-centered-ish vectors): each
    // embedding packs into two 32-bit sign words, candidate scoring
    // is bit_count(xor) per word — pure INTEGER arithmetic, so the
    // shortlist is deterministic and hash-exact across engines, with
    // no float in the path until the exact-cosine rerank of the
    // bounded shortlist (the q_sim_rerank two-stage shape). At 100 TB
    // the packed words are a 500 GB column scanned with SIMD-friendly
    // popcounts while the float vectors are touched only for
    // shortlist×queries point lookups. Shortlist cut = bounded TopK
    // aggregator (ASC Hamming feeds it negated).
    QueryDef.sql("q_sim_binary", binaryQuantSql) { (s, dir) =>
      binaryQuantRerank(emb(s, dir), gateProbes(s, dir),
        RerankShortlist, TopK)
    },

    // Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the
    // standard hybrid-retrieval combiner: the BM25 lexical top-15
    // (q_sim_bm25's exact list, shared SQL pieces) fused with the
    // dense cosine top-15 for probe 0 (doc and vector ids are the
    // shared key, the q_ann_filter convention) by
    // rrf = Σ_lists 1e9 // (60 + rank) — INTEGER division, so the
    // fused score is exact and both engines hash value-for-value
    // (the float 1/(60+r) form would be the same ranking; the
    // scaled-integer form removes the last float from the path).
    // Docs appearing in one list score on that list alone (the
    // standard convention). Scale: each list is already a bounded
    // top-k, so fusion is a full-outer join + window over ≤2k rows —
    // per-query work is O(k), whatever the corpus.
    QueryDef.sql("q_sim_rrf", rrfSql) { (s, dir) =>
      val lex = graft.operators.TextOps
        .bm25TopK(DedupOps.spread(Tables(s, dir, "documents")))
        .select(col("doc_id"), col("bm25"))
        // bounded single-partition window: ranks a k-row list
        .withColumn("lrnk", row_number().over(
          BoundedWindow.orderBy(col("bm25").desc, col("doc_id")))
          .cast("int"))
        .select(col("doc_id"), col("lrnk"))
      val dense = bruteForceTopK(emb(s, dir),
        gateProbes(s, dir).filter(col("query_id") === 0),
        graft.operators.TextOps.Bm25TopK)
        .select(col("neighbor_id").as("doc_id"),
          col("rnk").cast("int").as("drnk"))
      rrfFuse(lex, dense)
    },

    // Margin-based bitext mining (Artetxe & Schwenk ACL'19): cosine
    // normalized by both endpoints' k-NN neighborhood means, per-A
    // best-margin election with a mutual-best flag — the parallel-
    // corpus mining rule that suppresses hub vectors. The parity
    // split stands in for the two languages' encoder outputs; at
    // scale the pair set is cell-blocked and the elections are
    // windows over bounded (id, cos) pairs. The neighborhood means
    // fold in (cos, id)-sorted order on BOTH engines, so no float
    // sum-order divergence.
    QueryDef.sql(
      "q_bitext_mine",
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
         |           FROM embeddings WHERE vec_id < $NumCentroids),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |         ${cosSql("c.cv", "e.embedding")} AS cos
         |  FROM embeddings e CROSS JOIN c),
         |cells AS (
         |  SELECT vec_id, embedding, centroid_id
         |  FROM (SELECT vec_id, embedding, centroid_id,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY cos DESC, centroid_id) AS arnk
         |        FROM scored)
         |  WHERE arnk = 1),
         |p AS (
         |  SELECT x.vec_id AS a_id, y.vec_id AS b_id,
         |         ${cosSql("x.embedding", "y.embedding")} AS cos
         |  FROM cells x JOIN cells y ON x.centroid_id = y.centroid_id
         |  WHERE x.vec_id % 2 = 0 AND y.vec_id % 2 = 1),
         |fk AS (SELECT a_id, b_id, cos
         |       FROM (SELECT a_id, b_id, cos,
         |                    row_number() OVER (PARTITION BY a_id
         |                                       ORDER BY cos DESC, b_id) AS rnk
         |             FROM p)
         |       WHERE rnk <= $BitextMineK),
         |fm AS (SELECT a_id,
         |              list_sum(list(cos ORDER BY cos, b_id))
         |                / CAST(count(*) AS DOUBLE) AS fmean
         |       FROM fk GROUP BY a_id),
         |bk AS (SELECT a_id, b_id, cos
         |       FROM (SELECT a_id, b_id, cos,
         |                    row_number() OVER (PARTITION BY b_id
         |                                       ORDER BY cos DESC, a_id) AS rnk
         |             FROM p)
         |       WHERE rnk <= $BitextMineK),
         |bm AS (SELECT b_id,
         |              list_sum(list(cos ORDER BY cos, a_id))
         |                / CAST(count(*) AS DOUBLE) AS bmean
         |       FROM bk GROUP BY b_id),
         |m AS (SELECT p.a_id, p.b_id, p.cos,
         |             p.cos / ((fm.fmean + bm.bmean) / 2) AS margin
         |      FROM p JOIN fm ON p.a_id = fm.a_id
         |             JOIN bm ON p.b_id = bm.b_id
         |      WHERE fm.fmean + bm.bmean > 0),
         |best AS (SELECT a_id, b_id, cos, margin
         |         FROM (SELECT a_id, b_id, cos, margin,
         |                      row_number() OVER (PARTITION BY a_id
         |                                         ORDER BY margin DESC, b_id) AS rn
         |               FROM m)
         |         WHERE rn = 1),
         |bestb AS (SELECT a_id, b_id
         |          FROM (SELECT a_id, b_id,
         |                       row_number() OVER (PARTITION BY b_id
         |                                          ORDER BY margin DESC, a_id) AS rn
         |                FROM m)
         |          WHERE rn = 1)
         |SELECT f.a_id, f.b_id, round(f.cos, 6) AS cos,
         |       round(f.margin, 6) AS margin,
         |       r.a_id IS NOT NULL AS is_mutual
         |FROM best f LEFT JOIN bestb r
         |  ON f.a_id = r.a_id AND f.b_id = r.b_id""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      bitextMine(e,
        e.filter(col("vec_id") < NumCentroids)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv")),
        BitextMineK)
    },

    // Measured IVF recall-vs-nprobe curve — the "how many cells must
    // I probe" tuning table for the TRAINED serving geometry (the
    // same codebook every ivfTrainedServeSql gate probes), computed
    // from ONE corpus scan (each scored pair carries its cell's
    // probe rank, so every depth is a filter + bounded window over
    // the same table). Exact-integer recall; spec pins each depth
    // against an independent ivfSearch run, monotone recall, and
    // 100% at full probe depth.
    QueryDef.sql(
      "q_ivf_recall_curve", {
        val runs = (1 to NumCentroids).map(np =>
          s"""  SELECT $np AS nprobe, query_id, vec_id
             |  FROM (SELECT query_id, vec_id,
             |               row_number() OVER (PARTITION BY query_id
             |                                  ORDER BY cos DESC, vec_id) AS rnk
             |        FROM sc WHERE crnk <= $np)
             |  WHERE rnk <= $TopK""".stripMargin)
          .mkString("\n  UNION ALL\n")
        s"""WITH $ivfTrainedCtes,
           |asg AS (
           |  SELECT e.vec_id, c.centroid_id,
           |         ${cosSql("c.cv", "e.embedding")} AS cos
           |  FROM embeddings e CROSS JOIN c),
           |cells AS (
           |  SELECT vec_id, centroid_id
           |  FROM (SELECT vec_id, centroid_id,
           |               row_number() OVER (PARTITION BY vec_id
           |                                  ORDER BY cos DESC, centroid_id) AS arnk
           |        FROM asg)
           |  WHERE arnk = 1),
           |q AS (SELECT vec_id AS query_id, embedding AS qv
           |      FROM embeddings WHERE vec_id < $NumProbes),
           |pc AS (
           |  SELECT query_id, centroid_id,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY ccos DESC, centroid_id) AS crnk
           |  FROM (SELECT q.query_id, c.centroid_id,
           |               ${cosSql("q.qv", "c.cv")} AS ccos
           |        FROM q CROSS JOIN c)),
           |sc AS (
           |  SELECT q.query_id, e.vec_id,
           |         ${cosSql("q.qv", "e.embedding")} AS cos,
           |         pc.crnk
           |  FROM embeddings e
           |  JOIN cells ON e.vec_id = cells.vec_id
           |  CROSS JOIN q
           |  JOIN pc ON pc.query_id = q.query_id
           |         AND pc.centroid_id = cells.centroid_id
           |  WHERE e.vec_id <> q.query_id),
           |bf AS (SELECT query_id, vec_id
           |       FROM (SELECT query_id, vec_id,
           |                    row_number() OVER (PARTITION BY query_id
           |                                       ORDER BY cos DESC, vec_id) AS rnk
           |             FROM sc)
           |       WHERE rnk <= $TopK),
           |nr AS (SELECT count(*) AS n_relevant FROM bf),
           |runs AS (
           |$runs
           |)
           |SELECT CAST(r.nprobe AS INTEGER) AS nprobe,
           |       CAST(count(*) AS BIGINT) AS n_returned,
           |       CAST(sum(CASE WHEN bf.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_hits,
           |       CAST(sum(CASE WHEN bf.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            * 100 // max(nr.n_relevant) AS BIGINT) AS recall_pct
           |FROM runs r
           |LEFT JOIN bf ON r.query_id = bf.query_id AND r.vec_id = bf.vec_id
           |CROSS JOIN nr
           |GROUP BY r.nprobe""".stripMargin
      }) { (s, dir) =>
      ivfRecallCurve(emb(s, dir), gateCodebook(s, dir), TopK, NumCentroids)
    }
  )

  /** Cell-population bound for [[semdedupClosestPairs]]: the
    * within-cell pair join is quadratic in cell population BY DESIGN
    * (the paper's shape), so — like the Jaccard path's
    * [[DedupOps.MaxShingleDf]] stop-shingle cap — a hot cell (a
    * boilerplate-heavy embedding cluster, exactly what dedup targets)
    * must not pin one reducer with n² pairs. Cells above the bound
    * sub-split before scoring. Gate cells are orders of magnitude
    * below it, so the gate's oracle replicates the UNSPLIT shape. */
  val SemdedupMaxCell = 4096

  /** Sign-band bits for the hot-cell sub-split — axis-plane LSH like
    * [[LshBits]]: members of a hot cell that could actually be each
    * other's closest pair agree on nearby sign structure, so the
    * split preserves the pairs SemDeDup prunes first. */
  val SemdedupSplitBits = 16

  /** Pair-scoring blocks for [[semdedupClosestPairs]] with the
    * hot-cell guard applied: (vec_id, centroid_id, blk), where pair
    * scoring is scoped to equal (centroid_id, blk).
    *
    * Cold cells (population ≤ maxCell) form one block — the paper's
    * exact shape. Hot cells sub-split in two stages, both
    * deterministic:
    *  1. a [[SemdedupSplitBits]]-bit sign band of the embedding —
    *     geometric, so near-duplicates stay together;
    *  2. any band still above maxCell (its members then share full
    *     sign structure, i.e. they are near-duplicates of EACH OTHER,
    *     so any within-chunk pair is a near-top pair and locality no
    *     longer discriminates) chunks by rank: consecutive
    *     maxCell-sized runs in vec_id order. The rank window sorts
    *     one hot band in one task — O(n log n) with spill, the
    *     bounded cost that replaces the O(n²) pair explosion.
    *
    * Per-task pair volume is therefore ≤ maxCell²/2, whatever the
    * skew. */
  def semdedupBlocks(
      e: DataFrame, numCentroids: Int, maxCell: Int): DataFrame = {
    val centroids = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    // pinned: consumed by the cold branch, the hot branch AND the
    // caller's size aggregate — without it each consumer repeats the
    // full assignment pass (map-side over the collected constants)
    val cells = assignConst(e, collectCentroids(centroids)).pinned
    val sizes = cells.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_cell"))
    val withSize = cells.join(broadcast(sizes), "centroid_id")
    val cold = withSize.filter(col("n_cell") <= maxCell)
      .select(col("vec_id"), col("centroid_id"), lit(0L).as("blk"))
    val band = (0 until SemdedupSplitBits)
      .map(j => when(element_at(col("embedding"), j + 1) > 0f,
        lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    val hotRank = Window.partitionBy(col("centroid_id"), col("band"))
      .orderBy(col("vec_id"))
    val hot = withSize.filter(col("n_cell") > maxCell)
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("centroid_id"), band.cast("long").as("band"))
      .withColumn("blk",
        col("band") * (1L << 32) +
          floor((row_number().over(hotRank) - lit(1)) / lit(maxCell))
            .cast("long"))
      .select(col("vec_id"), col("centroid_id"), col("blk"))
    cold.union(hot)
  }

  /** The q_semdedup body, named so the gate registration and the
    * seeded-cluster spec drive the same production plan: assign each
    * vector to its nearest of the first `numCentroids` seed vectors,
    * then emit each cell's closest within-cell pair (keep_id <
    * drop_id) plus the cell population. All pairwise work is scoped
    * inside a (cell, block) equi-join — [[semdedupBlocks]] bounds
    * per-task pair volume under skew; on gate data every cell is one
    * block and the output is the paper's exact closest pair. */
  def semdedupClosestPairs(e: DataFrame, numCentroids: Int,
      maxCell: Int = SemdedupMaxCell): DataFrame = {
    val s = e.sparkSession
    val blocks = semdedupBlocks(e, numCentroids, maxCell).pinned
    // n_members is the ORIGINAL cell population — the sub-split is an
    // execution detail, not part of the decision record
    val sizes = blocks.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
    val pairs = blocks.as("x")
      .join(blocks.as("y"),
        col("x.centroid_id") === col("y.centroid_id") &&
          col("x.blk") === col("y.blk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.centroid_id").as("centroid_id"),
        col("x.blk").as("blk"),
        col("x.vec_id").as("keep_id"), col("y.vec_id").as("drop_id"))
      .join(e.select(col("vec_id").as("keep_id"),
        col("embedding").as("ek")), "keep_id")
      .join(e.select(col("vec_id").as("drop_id"),
        col("embedding").as("ed")), "drop_id")
      .select(col("centroid_id"), col("blk"), col("keep_id"), col("drop_id"),
        CosineSimilarity(s, col("ek"), col("ed")).as("cos"))
    // two bounded top-1 stages: per block first (≤ maxCell²/2 rows per
    // partition), then per cell over the ≤ #blocks block winners — a
    // hot cell never funnels all its pairs through one window task
    val perBlock = Window.partitionBy(col("centroid_id"), col("blk"))
      .orderBy(col("cos").desc, col("keep_id"), col("drop_id"))
    val perCell = Window.partitionBy(col("centroid_id"))
      .orderBy(col("cos").desc, col("keep_id"), col("drop_id"))
    pairs
      .withColumn("brnk", row_number().over(perBlock)).filter(col("brnk") === 1)
      .withColumn("rnk", row_number().over(perCell)).filter(col("rnk") === 1)
      .join(sizes, Seq("centroid_id"))
      .select(col("centroid_id"), col("n_members"), col("keep_id"),
        col("drop_id"), round(col("cos"), 6).as("sim"))
  }

  /** Vector → its [[PqSubspaces]] contiguous subvectors. */
  private def subvecs(v: Column): Column =
    transform(sequence(lit(0), lit(PqSubspaces - 1)),
      j => slice(v, j * PqSubDim + 1, lit(PqSubDim)))

  /** Exploded per-subspace codebook (sub, cid, csub), seeded from
    * [[PqCentroids]] consecutive vectors starting at `seedFrom` —
    * [[PqSubspaces]]×[[PqCentroids]] rows, always broadcast. The
    * seed offset matters for RESIDUAL coding: the IVF seed vectors'
    * residuals are zero, so the residual codebook seeds past them. */
  private def pqCodebook(e: DataFrame, seedFrom: Int = 0): DataFrame =
    e.filter(col("vec_id") >= seedFrom &&
        col("vec_id") < seedFrom + PqCentroids)
      .select(col("vec_id").cast("int").as("cid"),
        posexplode(subvecs(col("embedding"))).as(Seq("sub", "csub")))

  /** Strictly sequential squared-L2 between two float arrays, cast
    * element-wise to double — matches the oracle's `list_sum` order. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Per-subspace PQ assignment against an EXPLICIT codebook
    * (sub, cid, csub): (vec_id, sub, code, dmin) — the argmin over
    * the broadcast codebook, deterministic via the lexicographic
    * `min(struct(d2, cid))` tie-break. */
  def pqAssignWith(e: DataFrame, cb: DataFrame): DataFrame = {
    val ev = e.select(col("vec_id"),
      posexplode(subvecs(col("embedding"))).as(Seq("sub", "esub")))
    ev.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub"),
        sqDist(col("esub"), col("csub")).as("d2"), col("cid"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2").as("d"), col("cid").as("c"))).as("m"))
      .select(col("vec_id"), col("sub"),
        col("m.c").as("code"), col("m.d").as("dmin"))
  }

  /** Gate-path assignment: codebook seeded from the corpus itself. */
  def pqAssign(e: DataFrame, seedFrom: Int = 0): DataFrame =
    pqAssignWith(e, pqCodebook(e, seedFrom))

  /** Per-subspace L2 k-means codebook training (Lloyd) — the trained
    * counterpart of the gate's SEEDED [[pqCodebook]], mirroring how
    * [[ivfTrain]] relates to the seeded IVF gate centroids: the gate
    * stays deterministic and oracle-replicable on seeds, while this
    * produces the codebook a production index build would store.
    * Quantization quality is the whole PQ game — the recall spec
    * measures seeded vs trained side by side.
    *
    * Scale: each iteration is one broadcast-join assignment pass +
    * one (sub, cid, dim)-bounded mean aggregate; the codebook stays
    * m×k rows; rounds are pinned via [[Materialize.pinIter]] like
    * every training loop here. Empty cells keep their previous
    * centroid. Offline index-build utility, not a per-query path. */
  def pqTrain(e: DataFrame, k: Int = PqCentroids, iters: Int = 5): DataFrame =
    pqLloyd(e, k, iters, "pqTrain", c => avg(c))

  /** The shared Lloyd loop behind [[pqTrain]] and
    * [[pqTrainQuantized]] — ONE copy of the seeding, assignment,
    * argmin tie-break and empty-cell carry, parameterized only by
    * how a dimension mean is finished (`identity` vs 6-dp rounding).
    *
    * Seeding is by RANK over the vec_id order, not raw-id modular
    * arithmetic: on a sparse or offset id space (a filtered corpus)
    * `vec_id % stride` can select fewer than k — even zero — rows
    * and silently return a degenerate codebook. The two-phase
    * surrogate rank is dense 1..n by construction, so ranks
    * 0, stride, …, (k-1)·stride always exist; one bounded k-row
    * collect ships the seed ids as a broadcast-joinable set. */
  private def pqLloyd(e: DataFrame, k: Int, iters: Int, caller: String,
      meanOf: Column => Column): DataFrame = {
    val s = e.sparkSession
    val n = e.count()
    require(n >= k, s"$caller: corpus has $n vectors, need at least k=$k")
    val seedIds = stridedSeedIds(e, n, k)
    val ev = e.select(col("vec_id"),
      posexplode(subvecs(col("embedding"))).as(Seq("sub", "esub")))
      .select(col("vec_id"), col("sub"),
        col("esub").cast("array<double>").as("esub"))
      .pinned // reused by every assignment round
    // The m×k codebook is index GEOMETRY, not data — it lives
    // driver-side for the whole loop (r22: the ivfLloyd shape applied
    // to the PQ training; the former frame-per-iteration form paid ~5
    // jobs per round — broadcast build, the sub-join argmin re-group,
    // the means exchange, the carry join and a pinIter — in a gate
    // whose wall is job-count × per-job floor, 24 jobs for 0.8 s of
    // task time). Each iteration is now ONE distributed job: ev holds
    // exactly one row per (vec_id, sub), so the argmin over the
    // codebook CONSTANTS is pure map-side array arithmetic
    // (array_min over struct(d2, cid) — the same lexicographic
    // tie-break as the former min(struct(d2, cid)) and the oracle's
    // ORDER BY d2, cid), feeding one (sub, cid)-bounded mean
    // aggregate whose m×k rows are collected. Arithmetic is
    // unchanged: sqDist over the same double arrays, meanOf per dim,
    // empty cells keep their previous centroid — the oracle's
    // unrolled CTE rounds replay bit-identically.
    var cb: Seq[((Int, Int), Seq[Double])] = ev
      .join(broadcast(seedIds), "vec_id")
      .select(col("sub"), col("cid"), col("esub"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toSeq
      .sortBy(_._1)
    (0 until iters).foreach { _ =>
      val cbBySub: Column = array((0 until PqSubspaces).map { sub =>
        array(cb.collect { case ((`sub`, cid), csub) =>
          struct(lit(cid).as("cid"),
            array(csub.map(lit(_)): _*).as("csub"))
        }: _*)
      }: _*)
      val m = array_min(transform(element_at(cbBySub, col("sub") + 1),
        c => struct(sqDist(col("esub"), c.getField("csub")).as("d"),
          c.getField("cid").as("c"))))
      val dimCols = (0 until PqSubDim).map(i =>
        meanOf(element_at(col("esub"), i + 1)).as(s"d$i"))
      val got = ev
        .select(col("sub"), m.getField("c").as("cid"), col("esub"))
        .groupBy(col("sub"), col("cid"))
        .agg(dimCols.head, dimCols.tail: _*)
        .select(col("sub"), col("cid"),
          array((0 until PqSubDim).map(i => col(s"d$i")): _*).as("new_csub"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          r.getSeq[java.lang.Double](2)).toMap
      // empty cells keep their previous centroid (the former
      // left_outer coalesce). Collected as BOXED doubles with a
      // null-element check — the ivfLloyd discipline: a silent unbox
      // would fabricate 0.0 where the frame form carried null through
      cb = cb.map { case (key, prev) =>
        got.get(key) match {
          case Some(nv) if !nv.contains(null) =>
            key -> nv.map(_.doubleValue).toSeq
          case _ => key -> prev
        }
      }
    }
    // rebuild the m×k-row frame callers expect, in a deterministic
    // (sub, cid) order (bounded driver material, the ivfLloyd shape)
    import s.implicits._
    cb.map { case ((sub, cid), csub) => (sub, cid, csub) }
      .toDF("sub", "cid", "csub")
  }

  /** [[pqTrain]] with per-iteration centroid QUANTIZATION (means
    * rounded to 6 dp) — the oracle-replicable trained-codebook path
    * behind `q_pq_train`. Rounding pins the only cross-engine freedom
    * (summation order inside the dim-wise mean, ~1e-15), so both
    * engines run every Lloyd round on bit-identical codebooks:
    * assignments agree because inter-centroid distance gaps are
    * macroscopic next to ulps, and the 6-dp centroid grid costs
    * nothing against PQ's own quantization error. Same seeding
    * (two-phase rank), same argmin tie-break, same empty-cell carry
    * as [[pqTrain]].
    *
    * Output: the trained codebook exploded to (sub, cid, dim, v) —
    * scalar rows, so the gate hashes plain doubles, not arrays. */
  def pqTrainQuantized(e: DataFrame, k: Int = PqCentroids,
      iters: Int = PqTrainGateIters): DataFrame =
    pqLloyd(e, k, iters, "pqTrainQuantized", c => round(avg(c), 6))
      .select(col("sub"), col("cid"),
        posexplode(col("csub")).as(Seq("dim", "v")))

  /** Product-quantization code assignment (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): split
    * each vector into [[PqSubspaces]] contiguous [[PqSubDim]]-dim
    * subvectors and code each against its subspace's
    * [[PqCentroids]]-entry codebook by squared-L2 argmin; emit the
    * per-subspace codes plus the total reconstruction error.
    *
    * Scale design: the codebook (subspaces × centroids = 16 rows
    * here, m × 256 in production — tiny either way) BROADCASTS
    * through a `sub`-keyed equi-join, so coding is map-side over the
    * corpus: explode into subvectors, score against the codebook
    * rows of the same subspace, argmin via a lexicographic
    * `min(struct(d2, cid))` (deterministic centroid-id tie-break),
    * and re-assemble one code row per vector. No window, no
    * all-pairs anything. At 100 TB the coded corpus is
    * [[PqSubspaces]] small ints per vector instead of 64 floats —
    * the memory/scan ratio that makes IVF-PQ the standard ANN
    * layout. The squared-distance fold is strictly sequential
    * left-to-right, matching the oracle's `list_sum` order.
    *
    * Output: (vec_id, code0..code{m−1}, recon_err).
    */
  def pqCodes(e: DataFrame): DataFrame = {
    val a = pqAssign(e)
    def codeAt(j: Int): Column =
      max(when(col("sub") === j, col("code"))).cast("int").as(s"code$j")
    def errAt(j: Int): Column = max(when(col("sub") === j, col("dmin")))
    val recon = (0 until PqSubspaces).map(errAt).reduceLeft(_ + _)
    a.groupBy(col("vec_id"))
      .agg(codeAt(0),
        ((1 until PqSubspaces).map(codeAt)
          :+ round(recon, 6).as("recon_err")): _*)
  }

  /** Index-build half of IVFADC: residual-code the corpus against its
    * IVF cells. Returns (codes, residual codebook) — codes =
    * (vec_id, sub, code, dmin, centroid_id), codebook = the exploded
    * (cid, sub, csub) residual codebook both coding and search-time
    * distance tables must share. Both are ONE-OFF corpus passes at
    * 100 TB, stored alongside the data ([[writeIvfPqIndex]]). */
  def ivfPqIndex(e: DataFrame, centroids: DataFrame): (DataFrame, DataFrame) = {
    val cells = assignConst(e, collectCentroids(centroids))
      .pinned // reused: residual build + coded-corpus scan
    val rdf = e.join(cells, "vec_id")
      .join(broadcast(centroids), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("embedding").cast("array<double>"),
          col("cv").cast("array<double>"), (x, y) => x - y).as("embedding"))
      .pinned // reused: codebook seed + per-subspace coding
    val cb = pqCodebook(rdf, ResidualSeedFrom)
    (pqAssignWith(rdf, cb).join(cells, "vec_id"), cb)
  }

  /** Search half of IVFADC, over EXPLICIT index artifacts — shared by
    * the in-memory gate path ([[ivfPqSearch]]) and the stored-index
    * path ([[ivfPqSearchStored]]) so the two cannot drift. */
  private def ivfPqSearchTail(codes: DataFrame, codebook: DataFrame,
      centroids: DataFrame, probes: DataFrame, nprobe: Int,
      k: Int): DataFrame = {
    val s = probes.sparkSession
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("centroid_id"), col("cv"),
        CosineSimilarity(s, col("qv"), col("cv")).as("ccos"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("crnk") <= nprobe)
    val qres = probeCells.select(col("query_id"), col("centroid_id"),
      posexplode(subvecs(zip_with(col("qv").cast("array<double>"),
        col("cv").cast("array<double>"), (x, y) => x - y)))
        .as(Seq("sub", "qsub")))
    val dt = qres.join(broadcast(codebook), "sub")
      .select(col("query_id"), col("centroid_id"), col("sub"), col("cid"),
        sqDist(col("qsub"), col("csub")).as("d"))
    val joined = codes.as("a")
      .join(broadcast(dt).as("t"),
        col("a.centroid_id") === col("t.centroid_id") &&
          col("a.sub") === col("t.sub") && col("a.code") === col("t.cid"))
      .select(col("t.query_id"), col("a.vec_id"), col("a.sub"), col("t.d"))
    adcTopK(joined, k)
  }

  /** Full IVFADC search (Jégou et al. TPAMI'11 §V): corpus vectors
    * are PQ-coded on their RESIDUAL to their IVF cell centroid; a
    * query probes its nprobe nearest cells, builds one residual
    * distance table per probed cell, and ADC-scores ONLY the coded
    * vectors of those cells — the composition that serves
    * billion-vector ANN in production.
    *
    * Scale design: everything small broadcasts (coarse centroids,
    * residual codebook, the queries×nprobe×m×k distance table —
    * 160 rows here); the corpus-sized pieces move at most twice
    * (cell assignment, residual coding — both one-off index-build
    * passes at 100 TB, stored alongside the data), and the per-query
    * scan touches nprobe/ncells of the CODE table only: small ints,
    * never the original floats. The scored join is an equi-join on
    * (cell, sub, code); the per-vector ADC sum re-assembles in fixed
    * subspace order; top-k is a bounded window over the probe
    * queries. Self-matches excluded, ties break on vec_id.
    *
    * Output: (query_id, neighbor_id, rnk, adc_dist).
    */
  def ivfPqSearch(e: DataFrame, centroids: DataFrame, probes: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val (codes, cb) = ivfPqIndex(e, centroids)
    ivfPqSearchTail(codes, cb, centroids, probes, nprobe, k)
  }

  /** Persist the IVFADC index as stored artifacts — the
    * [[DedupOps.writeBandIndex]] pattern for the ANN stack, making
    * "both passes are stored index artifacts, not per-query work"
    * literal: coarse centroids and the residual codebook land as tiny
    * dimension tables, and the coded corpus lands PARTITIONED BY IVF
    * CELL, so a search probing nprobe cells prunes the scan to
    * nprobe/ncells of the files — the IVF promise enforced by layout,
    * before a single byte is read. */
  def writeIvfPqIndex(
      e: DataFrame, centroids: DataFrame, prefix: String): Unit = {
    val (codes, cb) = ivfPqIndex(e, centroids)
    val s = e.sparkSession
    Seq("centroids", "codebook", "codes")
      .foreach(t => graft.sources.Sources.dropManaged(s, s"${prefix}_$t"))
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_centroids")
    cb.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_codebook")
    codes.write.mode("overwrite").format("parquet")
      .partitionBy("centroid_id").saveAsTable(s"${prefix}_codes")
  }

  /** Stored FULL-PRECISION IVF index: every corpus vector tagged with
    * its nearest centroid and saved bucketed+sorted by centroid_id
    * via [[graft.sources.Sources.writeBucketed]] — the serving layout
    * for [[annSearchStored]]: a probe batch joins it on centroid_id
    * with no exchange on the stored side (the probe side broadcasts).
    * The PQ twin ([[writeIvfPqIndex]]) trades precision for scan
    * bytes; this one serves exact in-cell scoring. */
  def writeIvfIndex(corpus: DataFrame, centroids: DataFrame,
      tableName: String, numBuckets: Int): Unit =
    // the index build is the big corpus pass: assign map-side over
    // the collected (k-row, bounded) centroids and carry the vector
    // through, so the ONLY exchange is writeBucketed's required
    // bucket-key shuffle — the window+self-join form paid two more
    // full-corpus exchanges before it. Cell ids match ivfAssign
    // exactly (assignConst's spec-pinned comparator).
    graft.sources.Sources.writeBucketed(
      assignConst(corpus, collectCentroids(centroids),
        Seq(col("embedding"))),
      tableName, Seq("centroid_id"), numBuckets)

  /** APPEND one batch of newly arriving (vec_id, embedding) vectors
    * into a stored [[writeIvfIndex]] table — the foreachBatch body
    * that closes the ingest→serve loop: each vector is assigned its
    * nearest centroid MAP-SIDE over the broadcast centroid constants
    * (the [[streamIvfIngest]] arithmetic, so the appended cell ids
    * match the batch [[ivfAssign]] exactly), and the rows land in the
    * SAME bucketed-by-centroid_id layout, so a serve probing the
    * updated table still reads it with zero exchange on the stored
    * side (spec-proven in `SourcesSpec`). The bucket spec must match
    * the existing table's — Spark rejects a mismatched append, which
    * is the failure mode you want for an index whose layout IS the
    * serving contract. */
  def appendIvfIndex(batch: DataFrame, centroids: Seq[(Long, Array[Float])],
      tableName: String, numBuckets: Int): Unit =
    // snapshot → append → stats bump, atomically vs other mutators
    Analytics.appendBucketedWithStats(
      assignConst(batch, centroids, Seq(col("embedding"))),
      tableName, Seq("centroid_id"), numBuckets)

  /** ANN serve over a STORED [[writeIvfIndex]] table, shaped so the
    * query batch may be a STREAMING DataFrame — the serving twin of
    * the streaming ingest screen:
    *
    *  - probe-cell selection is pure map-side array arithmetic over
    *    the centroid CONSTANTS (ncells is index geometry, bounded —
    *    the same O(constants) driver material as the bloom position
    *    set): no window function, so it plans inside a micro-batch.
    *    The comparator reproduces `ccos DESC, centroid_id ASC` —
    *    [[CosineSimilarity]] keeps the arithmetic bit-identical to
    *    the batch path and the oracle;
    *  - the index join BROADCASTS the probe batch (at 100 TB the
    *    index is the big side; per-trigger work is one map-side pass
    *    over the stored cells, no state store, no index shuffle);
    *  - the per-query top-k is the bounded [[graft.functions.TopK]]
    *    aggregator — k rows of state per query, never whole cells.
    *
    * On a batch `queries` input this returns exactly [[ivfSearch]]
    * (spec-pinned); the q_stream_ann gate runs it as a real stream
    * against the shared [[ivfTrainedServeSql]] oracle.
    */
  /** The `n` nearest centroid cells of the `qv` column by cosine,
    * as a sorted array of (ccos, centroid_id) structs — pure map-side
    * array arithmetic over the centroid CONSTANTS, the streamable
    * replacement for the crossJoin+window cell ranking (no window, so
    * it plans inside a micro-batch). The comparator reproduces
    * `ccos DESC, centroid_id ASC`; [[CosineSimilarity]] keeps the
    * arithmetic bit-identical to the batch path and the oracle.
    * Serves the n > 1 PROBE-side rankings ([[annSearchStored]]'s
    * probe-cell selection, the recall curve's full ranking) — probe
    * batches are small, so the interpreted lambda cost is bounded.
    * The n = 1 CORPUS passes (training, index build, cell tagging,
    * streaming ingest) run the native codegen'd
    * [[graft.functions.NearestCentroid]] instead, which is
    * parity-spec'd against this comparator. `vec` is the vector
    * column to rank cells for (default: the serve-side `qv`). */
  private def nearestCellsConst(s: SparkSession,
      centroids: Seq[(Long, Array[Float])], n: Int,
      vec: Column = col("qv")): Column = {
    val centArr = array(centroids.map { case (id, v) =>
      struct(lit(id).as("centroid_id"), array(v.map(lit(_)): _*).as("cv"))
    }: _*)
    val scored = transform(centArr, c => struct(
      CosineSimilarity(s, vec, c.getField("cv")).as("ccos"),
      c.getField("centroid_id").as("centroid_id")))
    // a NULL ccos (zero-norm or length-mismatched centroid) must sort
    // LAST like the oracle's ORDER BY cos DESC (NULLS LAST) — without
    // the coalesce every when() fails and the comparator falls through
    // to the id tie-break, letting a degenerate centroid sort FIRST
    val cc = (c: Column) =>
      coalesce(c.getField("ccos"), lit(Double.NegativeInfinity))
    val byCcosDesc = (l: Column, r: Column) =>
      when(cc(l) > cc(r), lit(-1))
        .when(cc(l) < cc(r), lit(1))
        .when(l.getField("centroid_id") < r.getField("centroid_id"), lit(-1))
        .when(l.getField("centroid_id") > r.getField("centroid_id"), lit(1))
        .otherwise(lit(0))
    slice(array_sort(scored, byCcosDesc), 1, n)
  }

  /** Streaming IVF index ingest: assign each newly arriving vector
    * (a streaming (vec_id, qv) batch) to its nearest centroid —
    * STATELESS map-side arithmetic, the write half of the serving
    * story whose read half is [[annSearchStored]]. In production the
    * assigned rows append into the [[writeIvfIndex]] bucketed layout
    * per trigger (foreachBatch); output matches [[ivfAssign]] on the
    * same slice exactly (spec-pinned + shared-CTE oracle). */
  /** Map-side [[ivfAssign]] over COLLECTED centroid constants: each
    * corpus vector's nearest cell by the [[nearestCellsConst]]
    * comparator (`ccos DESC, centroid_id ASC`, bit-identical
    * [[CosineSimilarity]] arithmetic — output equals [[ivfAssign]]
    * exactly, spec-pinned), with `extra` columns carried through the
    * SAME projection. This is the 100 TB shape for training and
    * index-build assignment: the window form shuffles the whole
    * corpus × k to rank cells and then self-joins the corpus back to
    * reattach the vector; this one is a single scan-stage pass — no
    * exchange at all until whatever the caller aggregates next. */
  private def assignConst(corpus: DataFrame,
      centroids: Seq[(Long, Array[Float])],
      extra: Seq[Column] = Nil): DataFrame =
    corpus.select(col("vec_id") +:
      graft.functions.NearestCentroid(corpus.sparkSession,
        col("embedding"), centroids)
        .getField("centroid_id").as("centroid_id") +: extra: _*)

  /** The collected (centroid_id, cv) constants of a k-row centroid
    * frame — bounded driver material (index geometry, never data),
    * the input every map-side assignment and probe ranking
    * broadcasts. */
  /** Collect a (centroid_id, vector) frame to driver constants.
    * Fails fast on a null vector or null element: a centroid is a
    * driver-side CONSTANT with no keep-previous fallback (unlike a
    * Lloyd-iteration mean), and the naive `getSeq[Float]` unbox would
    * silently turn the null into 0.0f — a fabricated coordinate that
    * corrupts every assignment it feeds. */
  private def collectCentroids(
      centroids: DataFrame): Seq[(Long, Array[Float])] =
    centroids.collect().map { r =>
      val boxed = r.getSeq[java.lang.Float](1)
      require(boxed != null && !boxed.contains(null),
        s"centroid ${r.getLong(0)} has a null vector or null " +
          "element(s) — refusing to unbox null to 0.0f")
      (r.getLong(0), boxed.map(_.floatValue).toArray)
    }.toSeq

  /** Map-side nearest-cell assignment that keeps the RAW cosine:
    * (vec_id, centroid_id, cos) — for callers that rank on the
    * unrounded score (rounding first could flip near-tie orderings
    * the oracle ranks raw). */
  private def assignScored(vectors: DataFrame,
      centroids: Seq[(Long, Array[Float])], vec: Column): DataFrame =
    vectors
      .select(col("vec_id"),
        graft.functions.NearestCentroid(vectors.sparkSession, vec,
          centroids).as("c"))
      .select(col("vec_id"), col("c.centroid_id").as("centroid_id"),
        col("c.ccos").as("cos"))

  /** [[ivfAssign]]'s exact output schema (vec_id, centroid_id, sim)
    * computed map-side over collected constants — shared by the
    * streaming ingest (vec column `qv`) and the batch assignment
    * gates (vec column `embedding`), so the two cannot drift. */
  private def assignWithSim(vectors: DataFrame,
      centroids: Seq[(Long, Array[Float])], vec: Column): DataFrame =
    assignScored(vectors, centroids, vec)
      .select(col("vec_id"), col("centroid_id"),
        round(col("cos"), 6).as("sim"))

  def streamIvfIngest(newVectors: DataFrame,
      centroids: Seq[(Long, Array[Float])]): DataFrame =
    assignWithSim(newVectors, centroids, col("qv"))

  def annSearchStored(queries: DataFrame, index: DataFrame,
      centroids: Seq[(Long, Array[Float])], nprobe: Int, k: Int): DataFrame = {
    val s = queries.sparkSession
    val probed = queries
      .select(col("query_id"), col("qv"),
        explode(nearestCellsConst(s, centroids, nprobe)).as("pc"))
      .select(col("query_id"), col("qv"),
        col("pc.centroid_id").as("probe_centroid"))
    val cand = broadcast(probed)
      .join(index, col("probe_centroid") === index("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        CosineSimilarity(s, col("qv"), col("embedding")).as("cos"),
        col("vec_id"))
    graft.functions.TopK.perKey(cand, "query_id", "cos", "vec_id", k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rnk"), round(col("cos"), 6).as("sim"))
  }

  /** IVFADC search probing a STORED [[writeIvfPqIndex]] — per-query
    * work only: the probed cell ids (queries × nprobe, a bounded
    * driver scalar like the bloom position set) ship back as a
    * partition-pruning literal filter, so the code-table scan reads
    * ONLY the probed cells' files and feeds the broadcast ADC join
    * with no exchange on the stored side (spec-proven, the
    * `SourcesSpec` band-index pattern). Results are identical to
    * [[ivfPqSearch]] on the same corpus — same codebook, same tail. */
  def ivfPqSearchStored(spark: SparkSession, prefix: String,
      probes: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val centroids = spark.table(s"${prefix}_centroids")
    val codebook = spark.table(s"${prefix}_codebook")
    val probed = probes.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("centroid_id"),
        CosineSimilarity(spark, col("qv"), col("cv")).as("ccos"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("crnk") <= nprobe)
      .select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val codes = spark.table(s"${prefix}_codes")
      .filter(col("centroid_id").isInCollection(probed))
    ivfPqSearchTail(codes, codebook, centroids, probes, nprobe, k)
  }

  /** ADC search against an EXPLICIT codebook — used by the gate (on
    * the seeded codebook) and the recall spec (on a TRAINED one). */
  def pqAdcTopKWith(e: DataFrame, probes: DataFrame, cb: DataFrame,
      k: Int): DataFrame = {
    val qs = probes.select(col("query_id"),
      posexplode(subvecs(col("qv"))).as(Seq("sub", "qsub")))
    val dt = qs.join(broadcast(cb), "sub")
      .select(col("query_id"), col("sub"), col("cid"),
        sqDist(col("qsub"), col("csub")).as("d"))
    val joined = pqAssignWith(e, cb).as("a")
      .join(broadcast(dt).as("t"),
        col("a.sub") === col("t.sub") && col("a.code") === col("t.cid"))
      .select(col("t.query_id"), col("a.vec_id"), col("a.sub"), col("t.d"))
    adcTopK(joined, k)
  }

  /** PQ asymmetric-distance search (ADC, Jégou et al. TPAMI'11 §IV):
    * for each query, precompute the m×k table of squared distances
    * from the query's subvectors to every codebook centroid, then
    * score every CODED vector by summing m table lookups — the
    * search-time half of IVF-PQ, where the corpus is scanned as
    * [[PqSubspaces]] small ints per vector and the original floats
    * are never touched.
    *
    * Scale design: the distance table is queries × m × k rows (80
    * here; a few thousand in production) and BROADCASTS; scoring is
    * a map-side equi-join on (sub, code) over the code table, and
    * the per-vector sum is re-assembled in FIXED subspace order
    * (conditional-max pivot, d0+d1+…) so both engines add the same
    * doubles in the same sequence. Top-k per query is a bounded
    * window over [[NumProbes]] partitions cut on the UNROUNDED
    * score; ADC distances are exact reconstruction distances when a
    * vector equals its code reconstruction (spec-pinned).
    *
    * Output: (query_id, neighbor_id, rnk, adc_dist) per query ×
    * top-k, self-matches excluded.
    */
  def pqAdcTopK(e: DataFrame, probes: DataFrame, k: Int): DataFrame =
    pqAdcTopKWith(e, probes, pqCodebook(e), k)

  /** Shared ADC re-assembly tail for [[pqAdcTopK]] and
    * [[ivfPqSearch]]: pivot the per-subspace lookups into a
    * FIXED-ORDER sum (both engines add the same doubles in the same
    * sequence), exclude self-matches, rank per query on the unrounded
    * score with vec_id tie-break, and cut at k. One body so the two
    * search paths cannot drift on tie-break or rounding. Input:
    * (query_id, vec_id, sub, d). */
  private def adcTopK(joined: DataFrame, k: Int): DataFrame = {
    def distAt(j: Int): Column = max(when(col("sub") === j, col("d")))
    val adc = (0 until PqSubspaces).map(distAt).reduceLeft(_ + _)
    // bounded TopK digest cut over the (corpus-sized) code table —
    // the aggregator ranks ord DESC, so the ASC distance cut feeds
    // it NEGATED (IEEE negation is exact; ties still break vec_id)
    graft.functions.TopK.perKey(
      joined.groupBy(col("query_id"), col("vec_id"))
        .agg(adc.as("adc"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), (-col("adc")).as("negadc")),
      "query_id", "negadc", "vec_id", k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        round(-col("negadc"), 6).as("adc_dist"))
  }
}
