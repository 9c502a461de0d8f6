package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling equi-join: salt the hot side, replicate the small
  * side. A key that owns 30% of a 100 TB fact table pins one reducer
  * under a sort-merge join; salting spreads it across `salts` tasks
  * at the cost of replicating the other side `salts`×.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins automatically; explicit salting remains
  * the tool when the skewed side feeds an aggregation or the join is
  * broadcast-incompatible. Results are exactly those of the plain
  * equi-join (verified in the spec).
  */
object SkewJoin {

  /** @param big   the large, possibly skewed side
    * @param small the side cheap enough to replicate `salts` times
    * @param key   equi-join column present on both sides
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn REPLACES a same-named caller column and the final
    // drop would destroy it silently — fail loudly instead (the
    // SurrogateIds working-column discipline)
    require(!big.columns.contains("_salt") &&
        !small.columns.contains("_salt"),
      "saltedJoin: inputs must not carry a `_salt` column " +
        "(it is this operator's working column)")
    // deterministic round-robin within each partition: rows of one hot
    // key spread across `salts` buckets no matter how they cluster
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-key skew profile — the MEASURE step before reaching for
    * [[saltedJoin]] or AQE skew handling: one row per profiled key
    * column with total rows, distinct keys, the hottest key and its
    * count, the uniform-mean count, and skew_x100 =
    * floor(max·n_keys·100 / n_rows) — 100 means perfectly uniform,
    * 30·n_keys means one key owns 30% of the table. The top key is
    * elected via min(struct(-count, key)), i.e. deterministic
    * smallest-key tie-break, replayed identically in SQL.
    *
    * Scale: the classic two-level aggregate — per-key counts
    * partial-aggregate map-side, then ONE one-row reduction; nothing
    * but (key, count) pairs ever shuffle. Run it on the join key
    * BEFORE sizing salts: the report is the `salts` parameter's
    * input (spread ≈ skew_x100 / 100 tasks). */
  def skewProfile(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    counts
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_count"),
        min(struct((-col("c")).as("nc"), col("k"))).as("top"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        // double arithmetic from the first factor, mirrored in the
        // oracle's association order: the all-long form overflows at
        // exactly the scale this operator targets (max_count ~3e11 ×
        // n_keys ~1e6 × 100 > Long.Max — ANSI mode aborts the profile
        // query; non-ANSI silently reports a negative skew)
        floor(col("n_rows") * lit(100.0) / col("n_keys")).cast("bigint")
          .as("mean_x100"),
        floor(col("max_count").cast("double") * col("n_keys") * 100
            / col("n_rows"))
          .cast("bigint").as("skew_x100"),
        col("top.k").as("top_key"))
  }

  val all: Seq[QueryDef] = Seq(

    // The skew report that decides whether the join above needs its
    // salts (and how many): hottest-key share vs uniform, one row.
    QueryDef.sql(
      "q_skew_profile",
      """WITH c AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1),
        |m AS (SELECT k, c, max(c) OVER () AS mx FROM c)
        |SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(max(c) AS BIGINT) AS max_count,
        |       CAST(floor(sum(c) * 100.0 / count(*)) AS BIGINT) AS mean_x100,
        |       CAST(floor(max(c) * 1.0 * count(*) * 100 / sum(c)) AS BIGINT)
        |         AS skew_x100,
        |       CAST(min(CASE WHEN c = mx THEN k END) AS BIGINT) AS top_key
        |FROM m""".stripMargin) { (s, dir) =>
      skewProfile(Tables(s, dir, "events"), "user_id")
    },

    // Salted equi-join over the hottest natural key in the testdata
    // (events.user_id: ~70 events/user). The oracle is the PLAIN join
    // — salting must be a pure execution-strategy change with
    // bit-identical results.
    QueryDef.sql(
      "q_join_skew_salted",
      """SELECT e.event_id, e.user_id, u.n_events
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS n_events
        |      FROM events GROUP BY user_id) u
        |  ON u.user_id = e.user_id""".stripMargin) { (s, dir) =>
      val events = Tables(s, dir, "events")
      val perUser = events.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      saltedJoin(events.select(col("event_id"), col("user_id")),
        perUser, "user_id", salts = 8)
        .select(col("event_id"), col("user_id"), col("n_events"))
    })
}
