package graft.operators

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
}
