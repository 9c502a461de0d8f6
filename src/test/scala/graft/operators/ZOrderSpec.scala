package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The z-order layout must deliver what it exists for: per-file
  * min/max bounding boxes that are small in BOTH dimensions, where a
  * linear time-sorted layout leaves the second dimension's span at
  * ~the full domain. Parquet scan pruning reads exactly these
  * footer stats, so box area IS the fraction of data a
  * both-dimension filter has to touch.
  */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("z-value interleaves bits exactly (JVM reference) and is " +
    "monotone in each dimension's prefix") {
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.ZBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rows = graft.SparkEntry.queries("q_zorder_value")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == ref(r.getLong(1), r.getLong(2)),
        s"z mismatch for (${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("z-ordered files have small bounding boxes in BOTH dimensions; " +
    "a time-sorted layout does not") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        floor(col("ts_us") / 3600000000L).cast("long").as("hour"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder")
    val nFiles = 16
    ZOrder.writeZOrdered(ev, col("user_id"), col("hour"),
      nFiles, s"$tmp/z")
    // the baseline every event store starts from: sorted by time only
    ev.repartitionByRange(nFiles, col("hour"))
      .sortWithinPartitions(col("hour"))
      .write.mode("overwrite").parquet(s"$tmp/t")

    // per-file normalized min-max span per dimension — exactly what
    // parquet footer pruning can exclude: a filter on dimension d
    // skips a file iff its value range misses the file's [min, max],
    // so mean span IS the expected fraction of files a point/range
    // filter on that dimension must read. (Box AREA is the wrong
    // metric: ANY layout that splits one dimension n ways reaches
    // ~1/n area — as thin slabs that prune only that one dimension.)
    def meanSpans(path: String): (Double, Double) = {
      val df = spark.read.parquet(path)
        .select(col("user_id"), col("hour"),
          input_file_name().as("f"))
      val dom = df.agg(
        (max("user_id") - min("user_id")).cast("double").as("du"),
        (max("hour") - min("hour")).cast("double").as("dh")).head()
      val (du, dh) = (dom.getDouble(0), dom.getDouble(1))
      val r = df.groupBy("f").agg(
        ((max("user_id") - min("user_id")) / du).as("su"),
        ((max("hour") - min("hour")) / dh).as("sh"))
        .agg(avg("su"), avg("sh")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zUser, zHour) = meanSpans(s"$tmp/z")
    val (tUser, tHour) = meanSpans(s"$tmp/t")
    info(f"mean file span: z-order user=$zUser%.3f hour=$zHour%.3f; " +
      f"time-sort user=$tUser%.3f hour=$tHour%.3f")
    // the time-sorted baseline clusters time but leaves user-id
    // unclustered: a user filter reads every file
    assert(tUser > 0.9, f"baseline user span $tUser%.3f unexpectedly small")
    // z-order: BOTH dimensions' spans are fractional — filters on
    // either dimension prune files, the property the layout buys
    assert(zUser < 0.6, f"z-order user-dim span $zUser%.3f — no locality")
    assert(zHour < 0.6, f"z-order hour-dim span $zHour%.3f — no locality")
  }
}
