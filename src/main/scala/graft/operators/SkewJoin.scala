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
    // deterministic round-robin within each partition: rows of one hot
    // key spread across `salts` buckets no matter how they cluster
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  val all: Seq[QueryDef] = Seq(

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
