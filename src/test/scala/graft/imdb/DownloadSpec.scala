package graft.imdb

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** S1's Last-Modified cache (the part testable without egress). */
class DownloadSpec extends AnyFunSuite {

  test("cache JSON round-trips, including escapes") {
    val m = Map(
      "https://x/y.tsv.gz" -> "Wed, 21 Oct 2015 07:28:00 GMT",
      "https://a/b\"c" -> "Thu, 01 Jan 1970 00:00:00 GMT")
    assert(Download.parseCache(Download.renderCache(m)) == m)
  }

  test("LastModifiedCache persists across instances") {
    val dir = Files.createTempDirectory("graft_dl")
    val p = dir.resolve("cache.json")
    val c1 = new Download.LastModifiedCache(p)
    assert(c1.get("u") == None)
    c1.put("u", "lm-value")
    val c2 = new Download.LastModifiedCache(p)
    assert(c2.get("u") == Some("lm-value"))
  }

  test("dataset URLs follow the reference layout") {
    assert(s"${Download.DatasetBaseUrl}/${ImdbDataset.TitleBasics.fileName}" ==
      "https://datasets.imdbws.com/title.basics.tsv.gz")
  }
}
