package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence of the hand-written [[TopKBuf]] (binary-
  * search insert, null tail, merge, wire round-trip) against a
  * sort-based reference of the window comparator it claims to
  * implement — (ord DESC, id ASC) under SPARK's double ordering: NaN
  * largest and self-equal, -0.0 ties 0.0, null scores last. The draws
  * deliberately over-sample the degenerate values (NaN, ±0.0, nulls)
  * and a tiny discrete score set so ties and id tie-breaks occur
  * constantly; inputs are split into random partial buffers, each
  * optionally pushed through serialize/deserialize, then merged — the
  * exact partial-aggregate lifecycle the shuffle runs. */
class TopKBufSpec extends AnyFunSuite {

  /* strict "a ranks before b" under (ord DESC NULLS LAST, id ASC)
   * with Spark's double ordering */
  private def ranksBefore(a: (Option[Double], Long),
      b: (Option[Double], Long)): Boolean = (a._1, b._1) match {
    case (Some(x), Some(y)) =>
      def n(v: Double) = if (v == 0.0) 0.0 else v
      val c = java.lang.Double.compare(n(x), n(y))
      if (c != 0) c > 0 else a._2 < b._2
    case (Some(_), None) => true
    case (None, Some(_)) => false
    case (None, None) => a._2 < b._2
  }

  private def reference(rows: Seq[(Option[Double], Long)],
      k: Int): Seq[(Option[Double], Long)] =
    rows.sortWith(ranksBefore).take(k)

  private def drain(buf: TopKBuf): Seq[(Option[Double], Long)] = {
    val nulls = math.min(buf.nn, buf.k - buf.n)
    (0 until buf.n).map(j => (Some(buf.ords(j)), buf.ids(j))) ++
      (0 until nulls).map(j => (None, buf.nullIds(j)))
  }

  /* serialize/deserialize live on the aggregate; dummy children are
   * fine — the wire format never reads them */
  private def roundTrip(buf: TopKBuf): TopKBuf = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKAgg(Literal(1.0d), Literal(1L), buf.k)
    agg.deserialize(agg.serialize(buf))
  }

  test("500 random insert/split/serde/merge lifecycles equal the " +
    "sorted window-comparator reference, degenerate values included") {
    val rnd = new scala.util.Random(2718)
    // tiny discrete score pool → constant ties; one slot is null
    val pool: Array[Option[Double]] = Array(
      Some(Double.NaN), Some(0.0), Some(-0.0), Some(1.5), Some(1.5),
      Some(-2.25), Some(Double.MaxValue), Some(Double.MinValue),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity),
      None, None)
    (1 to 500).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val nRows = rnd.nextInt(40)
      val rows = Seq.fill(nRows)(
        (pool(rnd.nextInt(pool.length)), rnd.nextInt(12).toLong))
      // random partial-buffer split, preserving arrival order inside
      // each chunk (insertion order must not matter — assert exactly
      // that by comparing against the order-free sorted reference)
      val chunks = rows.grouped(1 + rnd.nextInt(7)).toSeq
      val partials = chunks.map { chunk =>
        val b = new TopKBuf(k)
        chunk.foreach {
          case (Some(o), i) => b.insert(o, i)
          case (None, i) => b.insertNull(i)
        }
        // a random subset of partials crosses the wire first
        if (rnd.nextBoolean()) roundTrip(b) else b
      }
      val merged = partials.foldLeft(new TopKBuf(k)) { (acc, p) =>
        var j = 0
        while (j < p.n) { acc.insert(p.ords(j), p.ids(j)); j += 1 }
        j = 0
        while (j < p.nn) { acc.insertNull(p.nullIds(j)); j += 1 }
        acc
      }
      val got = drain(merged)
      val want = reference(rows, k)
      // NaN != NaN under ==, so compare through Double.compare
      def same(a: (Option[Double], Long), b: (Option[Double], Long)) =
        a._2 == b._2 && ((a._1, b._1) match {
          case (Some(x), Some(y)) => java.lang.Double.compare(
            if (x == 0.0) 0.0 else x, if (y == 0.0) 0.0 else y) == 0
          case (None, None) => true
          case _ => false
        })
      assert(got.length == want.length &&
        got.zip(want).forall { case (a, b) => same(a, b) },
        s"trial $trial (k=$k): buf=$got ref=$want rows=$rows")
    }
  }
}
