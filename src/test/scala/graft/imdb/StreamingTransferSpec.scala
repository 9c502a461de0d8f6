package graft.imdb

import graft.SparkSpec
import java.nio.file.Files

/** Continuous TSV ingest: files dropped into a folder land typed and
  * key-deduplicated in the parquet sink, incrementally. */
class StreamingTransferSpec extends SparkSpec {

  test("streaming transfer types, dedups across files, and is incremental") {
    val in = Files.createTempDirectory("graft_stream_in")
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val header =
      "nconst\tprimaryName\tbirthYear\tdeathYear\tprimaryProfession\tknownForTitles"

    Files.writeString(in.resolve("batch1.tsv"),
      s"$header\nnm1\tAlice\t1970\t\\N\tactor\t\\N\nnm2\tBob\t\\N\t\\N\t\\N\t\\N")
    StreamingTransfer.runOnce(spark, in.toString, ImdbDataset.NameBasics, out, ckpt)
    val first = spark.read.parquet(out)
    assert(first.count() == 2)
    assert(first.schema("birthYear").dataType.typeName == "integer")

    // second file arrives later: one genuinely new row + one duplicate key
    Files.writeString(in.resolve("batch2.tsv"),
      s"$header\nnm2\tBob Duplicate\t1999\t\\N\t\\N\t\\N\nnm3\tCarol\t1985\t\\N\twriter\t\\N")
    StreamingTransfer.runOnce(spark, in.toString, ImdbDataset.NameBasics, out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.count() == 3, "duplicate nm2 must be dropped by stream state")
    val nm2 = all.filter(all("nconst") === "nm2").collect()(0)
    assert(nm2.getAs[String]("primaryName") == "Bob",
      "first arrival wins across micro-batches")
    assert(all.filter(all("nconst") === "nm3").count() == 1)
  }
}
