package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque `binary` payload columns plus typed metadata, with
  * decode/feature-extraction running batched per partition.
  *
  * The container has no media codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[MultimodalStub.decodeStub]]) —
  * but the Spark-side shape is real and is what matters at 100 TB:
  *  - payloads stay in one `BinaryType` column (never exploded into
  *    rows), so a scan prunes them away unless requested;
  *  - decode runs via `mapPartitions` over a typed Dataset — one
  *    codec init per partition, streaming batches, no driver hop —
  *    the Scala analog of an Arrow-batched Pandas UDF;
  *  - features land in fixed-width typed columns for downstream
  *    relational ops.
  */
object Multimodal {

  /** Typed decode output; the fixed schema downstream ops rely on. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** Documents re-framed as a binary-payload media table. */
  def asBinary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("media_source"))

  /** PNG signature bytes (the 8-byte magic every PNG starts with). */
  private[operators] val PngMagic = Array[Byte](
    0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
  // derived, not hand-maintained: the encode and the validate cannot
  // drift apart
  private[operators] val PngMagicHex =
    PngMagic.map(b => f"$b%02X").mkString

  /** The media table CONTAINERIZED: each payload carries a real
    * PNG-shaped header — the 8-byte signature followed by 4-byte
    * big-endian width and height (IHDR's first fields), dimensions
    * derived deterministically from doc_id — ahead of the body
    * bytes. Built with pure column expressions (int → 8 hex chars →
    * unhex = the big-endian byte encode), so the fixture itself is
    * engine-replayable. */
  def mediaWithHeader(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      concat(
        lit(PngMagic),
        unhex(lpad(hex((col("doc_id") % 1000 + 1).cast("int")), 8, "0")),
        unhex(lpad(hex((col("doc_id") % 777 + 1).cast("int")), 8, "0")),
        encode(col("text"), "UTF-8")).as("payload"))

  /** REAL binary container-header parsing — no stub anywhere in this
    * path: validate the 8-byte PNG signature and decode the two
    * 4-byte big-endian IHDR dimension fields straight out of the
    * payload with codegen'd byte arithmetic (substring on binary →
    * hex → base-16 conv). This is the production shape for
    * sidecar-less media ingest: header metadata (magic, dimensions,
    * byte size) is extractable at full scan speed without any codec,
    * and only payloads whose header QUALIFIES ever reach the
    * expensive decode stage. */
  def parseHeader(framed: DataFrame): DataFrame =
    framed.select(
      col("doc_id"),
      (hex(substring(col("payload"), 1, 8)) === PngMagicHex).as("magic_ok"),
      conv(hex(substring(col("payload"), 9, 4)), 16, 10)
        .cast("long").as("width"),
      conv(hex(substring(col("payload"), 13, 4)), 16, 10)
        .cast("long").as("height"),
      length(col("payload")).cast("long").as("n_bytes"))

  /** Partition-batched decode via the stub; real plumbing, fake codec. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    asBinary(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one "codec" init per partition would go here
        rows.map { case (id, bytes) =>
          val m = MultimodalStub.decodeStub(bytes)
          MediaFeatures(id, bytes.length, m._1, m._2, m._3)
        }
      }
      .toDF()
  }

  /** Resize planning on decoded dimensions: fit (width, height) into
    * a maxDim bounding box preserving aspect ratio, integer
    * arithmetic only (floor), zero-dimension guarded. Runs as a typed
    * map over [[decodeFeatures]] — the post-decode per-item transform
    * slot where a real pipeline calls the image library; the
    * dimension math (and its oracle) is exactly what surrounds that
    * call in production. */
  def resizeFeatures(s: SparkSession, dir: String, maxDim: Int): DataFrame = {
    import s.implicits._
    decodeFeatures(s, dir).as[MediaFeatures]
      .map { m =>
        val longest = math.max(m.width, m.height)
        val (w, h) =
          if (longest <= maxDim) (m.width, m.height)
          else (m.width * maxDim / longest, m.height * maxDim / longest)
        (m.doc_id, m.width, m.height, w, h)
      }
      .toDF("doc_id", "width", "height", "out_w", "out_h")
  }

  /** Two-tier media dedup over (doc_id, text)-shaped input: exact
    * tier groups on the payload content hash; the perceptual tier
    * groups on a pHash-style fingerprint of the DECODED features (the
    * stub's width/height/frames stand in for a real DCT perceptual
    * hash — the plumbing, groupings and keep elections are the
    * production shape). Each tier is one hash-groupBy + a hash join
    * back: only (doc_id, hash) pairs ever shuffle, payloads never
    * leave their scan partitions — the property that makes media
    * dedup affordable when payloads are MBs each. A doc is an exact
    * dup if it loses its content-hash election, a near dup if it
    * survives exact but loses the perceptual election. */
  def mediaDedup(docs: DataFrame): DataFrame = {
    val m = docs.select(
      col("doc_id"),
      sha2(encode(col("text"), "UTF-8"), 256).as("content_hash"),
      md5(concat(
        (octet_length(encode(col("text"), "UTF-8")) % 640).cast("string"),
        lit(":"),
        (octet_length(encode(col("text"), "UTF-8")) % 480).cast("string"),
        lit(":"),
        (octet_length(encode(col("text"), "UTF-8")) % 16 + 1).cast("string")))
        .as("phash"))
    val exact = m.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("exact_keep"))
    val perceptual = m.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("phash_keep"))
    m.join(exact, "content_hash").join(perceptual, "phash")
      .select(col("doc_id"), col("content_hash"), col("phash"),
        col("exact_keep"), col("phash_keep"),
        (col("doc_id") =!= col("exact_keep")).as("is_exact_dup"),
        (col("doc_id") === col("exact_keep") &&
          col("doc_id") =!= col("phash_keep")).as("is_near_dup"))
  }

  val all: Seq[QueryDef] = Seq(

    // Media dedup, both tiers: exact on the content hash, perceptual
    // on the decoded-feature fingerprint — the dedup pass a 100 TB
    // media corpus runs BEFORE any expensive model-based screening.
    QueryDef.sql(
      "q_multimodal_dedup",
      """WITH m AS (
        |  SELECT doc_id, sha256(text) AS content_hash,
        |         md5(CAST(strlen(text) % 640 AS VARCHAR) || ':' ||
        |             CAST(strlen(text) % 480 AS VARCHAR) || ':' ||
        |             CAST(strlen(text) % 16 + 1 AS VARCHAR)) AS phash
        |  FROM documents),
        |e AS (SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS exact_keep
        |      FROM m GROUP BY 1),
        |p AS (SELECT phash, CAST(min(doc_id) AS BIGINT) AS phash_keep
        |      FROM m GROUP BY 1)
        |SELECT m.doc_id, m.content_hash, m.phash, e.exact_keep, p.phash_keep,
        |       m.doc_id <> e.exact_keep AS is_exact_dup,
        |       (m.doc_id = e.exact_keep AND m.doc_id <> p.phash_keep)
        |         AS is_near_dup
        |FROM m JOIN e USING (content_hash) JOIN p USING (phash)""".stripMargin) {
      (s, dir) => mediaDedup(Tables(s, dir, "documents"))
    },

    // REAL container-header parse — the no-stub member of this
    // family: payloads carry an actual PNG-shaped header (signature +
    // big-endian IHDR dimensions) and the gate validates the magic
    // and decodes the dimension fields with pure codegen'd byte
    // arithmetic. The oracle DERIVES the expected fields from doc_id
    // independently (not by replaying the parse), so the gate proves
    // header-encode → header-parse is the identity on every field —
    // plus the byte count seam (16-byte header + UTF-8 body).
    QueryDef.sql(
      "q_media_header",
      """SELECT doc_id, TRUE AS magic_ok,
        |       CAST(doc_id % 1000 + 1 AS BIGINT) AS width,
        |       CAST(doc_id % 777 + 1 AS BIGINT) AS height,
        |       CAST(16 + strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin) {
      (s, dir) => parseHeader(mediaWithHeader(s, dir))
    },

    // Metadata extraction expressed as pure column ops over the binary
    // payload (hash, size, stub dimensions) — oracle-checkable.
    QueryDef.sql(
      "q_multimodal_meta",
      """SELECT doc_id,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       sha256(text) AS content_hash,
        |       CAST(strlen(text) % 640 AS INTEGER) AS width,
        |       CAST(strlen(text) % 480 AS INTEGER) AS height,
        |       CAST(strlen(text) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents""".stripMargin) {
      (s, dir) =>
        asBinary(s, dir).select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("content_hash"),
          (octet_length(col("payload")) % 640).as("width"),
          (octet_length(col("payload")) % 480).as("height"),
          (octet_length(col("payload")) % 16 + 1).as("n_frames"))
    },

    // Frame sampling: one output row per sampled frame (every 4th of
    // the stub's n_frames), the video analog of "explode the container
    // into work items". The payload never travels with the exploded
    // rows — only doc_id + frame_no + a per-frame key derived from the
    // content hash, so a 100 TB corpus explodes into cheap coordinates,
    // not copies. Real frame decode would map these coordinates
    // through the partition-batched codec ([[decodeFeatures]]).
    QueryDef.sql(
      "q_multimodal_frames",
      """SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
        |       md5(sha256(text) || ':' || CAST(f AS VARCHAR)) AS frame_key
        |FROM documents,
        |     unnest(range(1, strlen(text) % 16 + 2, 4)) AS t(f)""".stripMargin) {
      (s, dir) =>
        asBinary(s, dir)
          .select(col("doc_id"), sha2(col("payload"), 256).as("content_hash"),
            (octet_length(col("payload")) % 16 + 1).as("n_frames"))
          .select(col("doc_id"), col("content_hash"),
            explode(sequence(lit(1), col("n_frames"), lit(4))).as("frame_no"))
          .select(col("doc_id"), col("frame_no"),
            md5(concat(col("content_hash"), lit(":"),
              col("frame_no").cast("string"))).as("frame_key"))
    },

    // Resize planning over the decoded (stub) dimensions — integer
    // fit-into-256 box math, oracle-replicated exactly.
    QueryDef.sql(
      "q_multimodal_resize",
      """SELECT doc_id,
        |       CAST(strlen(text) % 640 AS INTEGER) AS width,
        |       CAST(strlen(text) % 480 AS INTEGER) AS height,
        |       CAST(CASE WHEN greatest(strlen(text) % 640, strlen(text) % 480) <= 256
        |                 THEN strlen(text) % 640
        |                 ELSE (strlen(text) % 640) * 256
        |                      // greatest(strlen(text) % 640, strlen(text) % 480)
        |            END AS INTEGER) AS out_w,
        |       CAST(CASE WHEN greatest(strlen(text) % 640, strlen(text) % 480) <= 256
        |                 THEN strlen(text) % 480
        |                 ELSE (strlen(text) % 480) * 256
        |                      // greatest(strlen(text) % 640, strlen(text) % 480)
        |            END AS INTEGER) AS out_h
        |FROM documents""".stripMargin) { (s, dir) =>
      resizeFeatures(s, dir, maxDim = 256)
    },

    // The mapPartitions decode path itself. The stub codec is
    // deterministic arithmetic on the payload length, so the oracle
    // can replicate it exactly — the gate checks the full mapPartitions
    // plumbing (encode → typed Dataset → per-partition decode → typed
    // columns) value-for-value, not just rows>0.
    QueryDef.sql(
      "q_multimodal_decode",
      """SELECT doc_id,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       CAST(strlen(text) % 640 AS INTEGER) AS width,
        |       CAST(strlen(text) % 480 AS INTEGER) AS height,
        |       CAST(strlen(text) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents""".stripMargin) { (s, dir) =>
      decodeFeatures(s, dir)
    }
  )
}

/** STUB: deterministic fake media decode — the container ships no
  * image/audio codecs. Returns (width, height, n_frames) derived only
  * from the payload bytes so results are reproducible everywhere.
  */
object MultimodalStub {
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) =
    (bytes.length % 640, bytes.length % 480, bytes.length % 16 + 1)
}
