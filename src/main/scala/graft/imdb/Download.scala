package graft.imdb

import java.io.{FileOutputStream, IOException}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

/** S1: dataset download with Last-Modified conditional fetch
  * (reference: pimdb/common.py:108-180). A plain driver-side utility —
  * deliberately NOT a Spark op: seven ~150 MB files don't need a
  * cluster, and the reference treats it the same way.
  *
  * The Last-Modified cache is a tiny JSON map
  * { url -> last-modified header } stored next to the downloads
  * (reference: LastModifiedMap, common.py:121-152).
  */
object Download {

  val DatasetBaseUrl = "https://datasets.imdbws.com"

  /** Minimal flat string-map JSON codec (no deps; values are HTTP
    * date strings, keys are URLs — both JSON-escaped). */
  private[imdb] def renderCache(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private[imdb] def parseCache(json: String): Map[String, String] = {
    // strings in this cache never contain unescaped quotes
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    entry.findAllMatchIn(json).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  final class LastModifiedCache(path: Path) {
    private var map: Map[String, String] =
      if (Files.exists(path)) parseCache(Files.readString(path)) else Map.empty
    def get(url: String): Option[String] = map.get(url)
    def put(url: String, lastModified: String): Unit = {
      map += url -> lastModified
      Files.createDirectories(path.toAbsolutePath.getParent)
      Files.writeString(path, renderCache(map))
    }
  }

  /** Download one dataset unless the server copy is unchanged.
    * Returns true if a new file was written.
    *
    * `baseUrl` may be an `http(s)://` endpoint (the reference's
    * datasets.imdbws.com), a `file://` URL, or a plain local folder —
    * the last two serve zero-egress environments and mirrors. All
    * three share the SAME Last-Modified conditional-fetch cache: for
    * local mirrors the source file's mtime plays the header. */
  def downloadDataset(
      dataset: ImdbDataset,
      targetFolder: String,
      onlyIfNewer: Boolean = true,
      baseUrl: String = DatasetBaseUrl): Boolean = {
    val url = s"${baseUrl.stripSuffix("/")}/${dataset.fileName}"
    val target = Paths.get(targetFolder, dataset.fileName)
    val cache = new LastModifiedCache(Paths.get(targetFolder, ".last_modified.json"))

    if (baseUrl.startsWith("file:"))
      return copyFromMirror(
        Paths.get(URI.create(url)), target, url, cache, onlyIfNewer)
    if (!baseUrl.contains("://"))
      return copyFromMirror(
        Paths.get(baseUrl, dataset.fileName), target, url, cache, onlyIfNewer)

    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL).build()
    val reqB = HttpRequest.newBuilder(URI.create(url))
    if (onlyIfNewer && Files.exists(target))
      cache.get(url).foreach(lm => reqB.header("If-Modified-Since", lm))
    val resp = client.send(reqB.build(), HttpResponse.BodyHandlers.ofInputStream())

    resp.statusCode() match {
      case 304 => false // up to date
      case 200 =>
        Files.createDirectories(target.getParent)
        val in = resp.body()
        val out = new FileOutputStream(target.toFile)
        try {
          val buf = new Array[Byte](8192) // reference chunk size, common.py:109
          Iterator.continually(in.read(buf)).takeWhile(_ > 0)
            .foreach(n => out.write(buf, 0, n))
        } finally { out.close(); in.close() }
        resp.headers().firstValue("Last-Modified").ifPresent(cache.put(url, _))
        true
      case code => throw new IOException(s"GET $url failed with HTTP $code")
    }
  }

  /** The local-mirror analog of the conditional GET: the source
    * mtime (as an RFC 1123 HTTP date) is the Last-Modified value, a
    * cache hit with an existing target is the 304 path (no copy). */
  private def copyFromMirror(
      source: Path, target: Path, url: String,
      cache: LastModifiedCache, onlyIfNewer: Boolean): Boolean = {
    if (!Files.exists(source))
      throw new IOException(s"GET $url failed: no such file: $source")
    val lastModified = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .format(Files.getLastModifiedTime(source).toInstant
        .atZone(java.time.ZoneOffset.UTC))
    if (onlyIfNewer && Files.exists(target) && cache.get(url).contains(lastModified))
      false // up to date — the 304 branch
    else {
      Files.createDirectories(target.toAbsolutePath.getParent)
      Files.copy(source, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      cache.put(url, lastModified)
      true
    }
  }
}
