package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque `binary` payload columns plus typed metadata, with
  * decode/feature-extraction running batched per partition.
  *
  * The decode path is REAL end to end: payloads are genuine PNGs
  * (encoded by the JDK's ImageIO on the executors, dimensions and
  * pixels derived deterministically from doc_id so every oracle can
  * recompute the expected pixel sums in closed form), and
  * [[decodePng]] decodes actual pixels back out of the compressed
  * container. The Spark-side shape is what matters at 100 TB:
  *  - payloads stay in one `BinaryType` column (never exploded into
  *    rows), so a scan prunes them away unless requested;
  *  - decode runs via `mapPartitions` over a typed Dataset — one
  *    codec init per partition, streaming batches, no driver hop —
  *    the Scala analog of an Arrow-batched Pandas UDF;
  *  - features land in fixed-width typed columns for downstream
  *    relational ops;
  *  - header metadata (magic, dimensions) parses at full scan speed
  *    with codegen'd byte arithmetic, so only payloads whose header
  *    QUALIFIES ever reach the expensive codec stage.
  */
object Multimodal {

  /** Typed decode output; the fixed schema downstream ops rely on.
    * `px_sum` is the decoded-pixel checksum (sum of all 8-bit gray
    * samples) — the field that proves real pixels came out of the
    * codec, and the crude perceptual fingerprint input. */
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int, px_sum: Long)

  /** Image-fixture geometry: width = doc_id % PngW + 1, height =
    * doc_id % PngH + 1 — small enough that a row's pixel raster is
    * bytes, coprime so (w, h) cycles through PngW*PngH shapes. */
  final val PngW = 31
  final val PngH = 17

  /** Gray value of pixel (x, y) of doc `id` — the generative formula
    * the oracles replay in closed form. */
  @inline private def gray(id: Long, x: Int, y: Int): Int =
    ((id * 7 + 3 * x + 5 * y) % 256).toInt

  /** The oracle-side pixel-sum expression: SUM of [[gray]] over the
    * doc's raster as a correlated double-unnest — shared by every
    * gate that checks decoded pixels. */
  private def pxSumSql: String =
    s"""CAST((SELECT sum((doc_id * 7 + 3 * x + 5 * y) % 256)
       |       FROM unnest(range(0, doc_id % $PngW + 1)) AS tx(x),
       |            unnest(range(0, doc_id % $PngH + 1)) AS ty(y))
       |     AS BIGINT)""".stripMargin

  private def encodePng(id: Long): Array[Byte] = {
    val w = (id % PngW + 1).toInt
    val h = (id % PngH + 1).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The corpus as a REAL image table: one genuine PNG payload per
    * doc (8-bit grayscale, ImageIO-encoded on the executors), shaped
    * deterministically from doc_id so decode results are
    * oracle-replayable without ever hashing the (codec-dependent)
    * container bytes. */
  def pngMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread() the doc_id column BEFORE the codec pass (r21): the
    // corpus ships as one small parquet file, so the scan plans 2–3
    // splits — and every per-doc ImageIO encode (and the decode pass
    // consuming these rows in the same stage) then runs on 2–3 cores
    // while the rest idle (StageProbe: the three media gates' only
    // heavy stage at 3 tasks). The shuffled rows are bare longs; the
    // codec work is orders of magnitude heavier than the exchange.
    mediaIds(s, dir)
      .mapPartitions { ids =>
        // codec init once per partition: no temp-file cache churn
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => (id, encodePng(id)))
      }
      .toDF("doc_id", "payload")
  }

  /** The media fixtures' common input: the corpus doc_id column,
    * [[DedupOps.spread]] across the session's cores so the per-doc
    * codec passes (PNG/WAV/GIF encode + their decodes, which ride the
    * same stage) aren't pinned to a small file's 2–3 scan splits. */
  private def mediaIds(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    DedupOps.spread(Tables(s, dir, "documents").select(col("doc_id")))
      .as[Long]
  }

  /** PNG signature bytes (the 8-byte magic every PNG starts with). */
  private[operators] val PngMagic = Array[Byte](
    0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
  // derived, not hand-maintained: the encode and the validate cannot
  // drift apart
  private[operators] val PngMagicHex =
    PngMagic.map(b => f"$b%02X").mkString

  /** The media table CONTAINERIZED with a hand-built header: the
    * 8-byte PNG signature followed by 4-byte big-endian width and
    * height (IHDR's first fields), dimensions derived
    * deterministically from doc_id, ahead of the body bytes. Built
    * with pure column expressions (int → 8 hex chars → unhex = the
    * big-endian byte encode), so the fixture itself is
    * engine-replayable — the header-parse gate's input. */
  def mediaWithHeader(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      concat(
        lit(PngMagic),
        unhex(lpad(hex((col("doc_id") % 1000 + 1).cast("int")), 8, "0")),
        unhex(lpad(hex((col("doc_id") % 777 + 1).cast("int")), 8, "0")),
        encode(col("text"), "UTF-8")).as("payload"))

  /** REAL binary container-header parsing: validate the 8-byte PNG
    * signature and decode the two 4-byte big-endian IHDR dimension
    * fields straight out of the payload with codegen'd byte
    * arithmetic (substring on binary → hex → base-16 conv). This is
    * the production shape for sidecar-less media ingest: header
    * metadata (magic, dimensions, byte size) is extractable at full
    * scan speed without any codec, and only payloads whose header
    * QUALIFIES ever reach the expensive decode stage. */
  def parseHeader(framed: DataFrame): DataFrame =
    framed.select(
      col("doc_id"),
      (hex(substring(col("payload"), 1, 8)) === PngMagicHex).as("magic_ok"),
      conv(hex(substring(col("payload"), 9, 4)), 16, 10)
        .cast("long").as("width"),
      conv(hex(substring(col("payload"), 13, 4)), 16, 10)
        .cast("long").as("height"),
      length(col("payload")).cast("long").as("n_bytes"))

  /** Partition-batched REAL image decode: ImageIO reads every PNG
    * payload back into pixels — dimensions from the decoded image,
    * checksum over the decoded raster samples. One codec init per
    * partition; payload bytes never leave their partition. A payload
    * the codec rejects fails loudly (a quarantine pass would filter
    * on [[parseHeader]].magic_ok first). */
  def decodePng(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"payload of doc $id is not a decodable image")
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              sum += raster.getSample(x, y, 0); x += 1
            }
            y += 1
          }
          MediaFeatures(id, img.getWidth, img.getHeight, sum)
        }
      }
      .toDF()
  }

  /** Encode → decode over the whole corpus: the q_multimodal_decode
    * body. Every field the gate emits comes out of the REAL codec;
    * the oracle recomputes the expected raster sums in closed form
    * from the generative formula, so a codec that returned wrong
    * pixels (or a fixture that encoded wrong ones) hash-fails. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame =
    decodePng(pngMedia(s, dir))

  /** Resize planning on DECODED dimensions: fit (width, height) into
    * a maxDim bounding box preserving aspect ratio, integer
    * arithmetic only (floor), zero-dimension guarded by the fixture
    * (w, h >= 1). Runs as a typed map over [[decodeFeatures]] — the
    * post-decode per-item transform slot where a real pipeline calls
    * the image library's scaler; the dimension math (and its oracle)
    * is exactly what surrounds that call in production. */
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

  /** Two-tier media dedup: exact tier groups on the body content
    * hash; the perceptual tier groups on a fingerprint of the
    * DECODED pixels — md5 over (width : height : raster checksum), a
    * crude stand-in for a DCT perceptual hash but computed from REAL
    * decoded samples, so two payloads collide exactly when their
    * decoded rasters have the same shape and mass. Each tier is one
    * hash-groupBy + a hash join back: only (doc_id, hash) pairs ever
    * shuffle, payloads never leave their scan partitions — the
    * property that makes media dedup affordable when payloads are
    * MBs each. A doc is an exact dup if it loses its content-hash
    * election, a near dup if it survives exact but loses the
    * perceptual election. */
  def mediaDedup(docs: DataFrame, decoded: DataFrame): DataFrame = {
    import Materialize.PinOps
    // pinned: m feeds THREE plan branches (exact tier, perceptual
    // tier, join-back) — unpinned, each re-runs decoded's lineage,
    // i.e. the full per-doc PNG encode + ImageIO decode of the
    // corpus, three times per execution
    val m = docs
      .select(col("doc_id"),
        sha2(encode(col("text"), "UTF-8"), 256).as("content_hash"))
      .join(decoded.select(col("doc_id"),
        md5(concat(
          col("width").cast("string"), lit(":"),
          col("height").cast("string"), lit(":"),
          col("px_sum").cast("string"))).as("phash")), "doc_id")
      .pinned
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

  // ---------------------------------------------------------------
  // Audio: REAL WAV (RIFF/PCM16) encode + decode via the JDK's
  // javax.sound.sampled — the waveform sibling of the PNG path, so
  // the "multimodal columns" family is plural in modality, not just
  // in gate count. Same discipline: payloads are genuine containers
  // built on the executors from a doc_id-derived generative formula,
  // the codec decodes actual samples back out, and the oracle
  // recomputes every emitted field in closed form (container bytes
  // are never hashed — the RIFF writer's chunk layout is a codec
  // detail; decoded SAMPLES are the contract).
  // ---------------------------------------------------------------

  /** Typed audio-decode output: rate/format from the codec, sample
    * stats from the decoded PCM frames. `abs_sum` is the decoded
    * waveform checksum (sum of |sample|) — the field that proves
    * real samples came out of the codec. */
  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Long, duration_us: Long, peak_abs: Int, abs_sum: Long)

  /** Audio-fixture sample rates, picked by doc_id % 4 — spanning the
    * telephony/speech/music rates a real corpus mixes. */
  final val WavRates = Array(8000, 16000, 22050, 44100)

  /** Max samples per clip; n = doc_id % MaxWavSamples + 1, so clip
    * lengths cycle and every doc's waveform stays bytes, not MBs. */
  final val MaxWavSamples = 480

  /** Signed 16-bit PCM sample i of doc `id` — the generative formula
    * the oracles replay in closed form. Operands are non-negative, so
    * `%` agrees between JVM, Spark and DuckDB. */
  @inline private def pcm(id: Long, i: Int): Int =
    (((id * 31 + i * 17) % 65536) - 32768).toInt

  private def encodeWav(id: Long): Array[Byte] = {
    val rate = WavRates((id % 4).toInt)
    val n = (id % MaxWavSamples + 1).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = pcm(id, i)
      data(2 * i) = (s & 0xff).toByte // PCM16 little-endian
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The corpus as a REAL audio table: one genuine WAV payload per
    * doc (RIFF container, 16-bit mono PCM, written by the JDK's wave
    * encoder on the executors), rate and samples derived
    * deterministically from doc_id. */
  def wavMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT spread (r21, measured): AudioSystem.write resolves its
    // file-writer provider through the synchronized service registry
    // on every call, so 32 concurrent encoder tasks serialize on the
    // lookup and the gate REGRESSED 0.98→1.5–1.9 s spread; the 2–3
    // scan-split tasks the corpus file yields are the cheaper shape
    // for this codec (the PNG/GIF codecs have no such global lock and
    // keep the spread — see mediaIds).
    Tables(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, encodeWav(id))))
      .toDF("doc_id", "payload")
  }

  // derived from the container constants, not hand-maintained
  private[operators] val RiffMagicHex =
    "RIFF".getBytes("US-ASCII").map(b => f"$b%02X").mkString
  private[operators] val WaveMagicHex =
    "WAVE".getBytes("US-ASCII").map(b => f"$b%02X").mkString
  private[operators] val FmtMagicHex =
    "fmt ".getBytes("US-ASCII").map(b => f"$b%02X").mkString

  /** Codegen'd RIFF header parse at full scan speed — magic check plus
    * the fmt chunk's LITTLE-endian sample-rate field (bytes 25–28 of
    * the canonical 44-byte PCM header), decoded by hex-ing the four
    * bytes in reversed order. The rate offset ASSUMES the canonical
    * layout (fmt chunk first, no LIST/fact insertions), so magic_ok
    * also asserts the `fmt ` chunk tag at bytes 13–16 — a WAV with an
    * extended or reordered chunk layout flags false instead of
    * silently mis-parsing a garbage hdr_rate. The production shape:
    * header metadata qualifies payloads before any of them reach the
    * codec stage. `keepPayload` carries the payload column through
    * for a consumer that feeds the codec NEXT — parse-then-decode
    * must be ONE pass over the payload bytes, never a self-join of
    * two scans. */
  def parseWavHeader(media: DataFrame,
      keepPayload: Boolean = false): DataFrame = {
    def b(i: Int) = hex(substring(col("payload"), i, 1))
    val cols = Seq(
      col("doc_id"),
      (hex(substring(col("payload"), 1, 4)) === RiffMagicHex &&
        hex(substring(col("payload"), 9, 4)) === WaveMagicHex &&
        hex(substring(col("payload"), 13, 4)) === FmtMagicHex)
        .as("magic_ok"),
      conv(concat(b(28), b(27), b(26), b(25)), 16, 10)
        .cast("int").as("hdr_rate")) ++
      (if (keepPayload) Seq(col("payload")) else Nil)
    media.select(cols: _*)
  }

  /** Decode ONE WAV payload through the JDK sound stack: rate/format
    * from the decoded AudioFormat, peak and |sample| checksum from
    * the decoded PCM frames themselves. A payload the codec rejects
    * fails loudly (a quarantine pass filters on
    * [[parseWavHeader]].magic_ok first). */
  private def decodeWavOne(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
      !f.isBigEndian && f.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"payload of doc $id is not 16-bit mono PCM")
    val rate = math.round(f.getSampleRate)
    val data = ais.readAllBytes()
    val n = data.length / 2
    var peak = 0
    var absSum = 0L
    var i = 0
    while (i < n) {
      val smp = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      val a = math.abs(smp.toInt)
      if (a > peak) peak = a
      absSum += a
      i += 1
    }
    // long division truncates toward zero; all operands are
    // non-negative, so this matches DuckDB's // floor on the oracle
    AudioFeatures(id, rate, n.toLong, n.toLong * 1000000L / rate,
      peak, absSum)
  }

  /** Partition-batched REAL audio decode over a (doc_id, payload)
    * table — the audio analog of [[decodePng]]. Payload bytes never
    * leave their partition. */
  def decodeWav(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        decodeWavOne(id, bytes) })
      .toDF()
  }

  /** Synthetic video-container magic for the COORDINATE fixture
    * ([[videoWithHeader]] / q_multimodal_frames — header-parse
    * plumbing only): 4 bytes + a 4-byte big-endian frame count, then
    * the body. The REAL frame-decode path ([[videoMedia]] /
    * [[decodeVideoFrames]]) uses actual GIF containers instead. */
  private[operators] val VidMagic = Array[Byte]('G', 'F', 'T', 'V')

  /** The corpus as a video-container table: 4-byte magic + 4-byte
    * big-endian frame count (doc_id-derived) + body — the frame
    * count lives IN the container header, where the sampling gate
    * parses it from, not in a side channel. */
  def videoWithHeader(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      concat(
        lit(VidMagic),
        unhex(lpad(hex((col("doc_id") % 16 + 1).cast("int")), 8, "0")),
        encode(col("text"), "UTF-8")).as("payload"))

  // ---------------------------------------------------------------
  // Video: REAL frame decode — the third modality, now on a REAL
  // container: each doc is a multi-frame (animated) GIF89a written
  // and read back with the JDK's own ImageIO codec, like the PNG and
  // WAV paths (no external video codec ships with the JDK — GIF is
  // the one standard multi-frame format it carries end-to-end). The
  // raster is 8-bit gray through an explicit 256-gray palette, so
  // the LZW round-trip is lossless and the oracle recomputes every
  // pixel stat in closed form from the generative formula. Same
  // discipline as PNG/WAV: qualify on the codegen'd magic first, one
  // codec pass per payload, frames never explode into rows — only
  // (doc_id, frame_no, stats) coordinates do. Frame SEEK is by image
  // index (reader.read(i)): GIF's LZW blocks are per-frame, so a
  // non-sampled frame's pixel data is never decompressed, though its
  // blocks are walked for sizing — the offset-jump property a real
  // production container (fMP4 etc.) gives exactly.
  // ---------------------------------------------------------------

  /** "GIF8" — the 4-byte prefix shared by GIF87a/GIF89a, the
    * scan-speed qualify. */
  private[operators] val VidMagicHex =
    "GIF8".getBytes("US-ASCII").map(b => f"$b%02X").mkString

  /** The GIF trailer byte. ImageIO's reader tolerates a container cut
    * mid-stream (best-effort decode), but a TRUNCATED media file must
    * flag loudly, not ship partial stats — decode asserts the trailer
    * is present before touching the codec. */
  private val GifTrailer: Byte = 0x3B

  /** Video-fixture geometry: n_frames = doc_id % 16 + 1 (matches the
    * [[videoWithHeader]] coordinate fixture), frame raster
    * w = doc_id % 5 + 2, h = doc_id % 3 + 2 — tiny so a row's payload
    * stays bytes, coprime moduli so shapes cycle. */
  final val VidMaxFrames = 16

  /** Every 4th frame is sampled — the q_multimodal_frames stride. */
  final val FrameSampleEvery = 4

  /** Gray value of pixel (x, y) of frame `f` of doc `id` — the
    * generative formula the oracle replays in closed form. Operands
    * are non-negative, so `%` agrees between JVM and DuckDB. */
  @inline private def vpx(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 7 + 11 * f + 3 * x + 5 * y) % 256).toInt

  /** Identity 256-level gray palette: index i maps to (i, i, i), so a
    * raster byte survives the palette indirection verbatim in every
    * channel and `getRGB & 0xff` reads the generative value back even
    * if a codec permuted indices. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val grays = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
  }

  /** One video container: a REAL animated GIF89a with n_frames
    * full-size w×h frames of 8-bit gray, written with the JDK's
    * ImageIO GIF writer on the executors. The writer is REUSED across
    * a partition's rows (reset + setOutput per container) — codec
    * lookup walks the ImageIO service registry, a per-row cost that
    * dwarfs the tiny fixture's actual encode work. */
  private def encodeVideo(writer: javax.imageio.ImageWriter,
      id: Long): Array[Byte] = {
    val n = (id % VidMaxFrames + 1).toInt
    val w = (id % 5 + 2).toInt
    val h = (id % 3 + 2).toInt
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // NON-interlaced frames: the JDK writer defaults to interlaced
      // row order, and the JDK reader's de-interlace DROPS rows on
      // rasters shorter than the 4-pass stride (a 2-row frame read
      // back with its bottom row zeroed — found round 19); row-order
      // storage is bit-exact at every geometry
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val cm = grayPalette
      var f = 1
      while (f <= n) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, vpx(id, f, x, y)); x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.reset() // detach the stream; the PARTITION owns the writer
      ios.close()
    }
    out.toByteArray
  }

  /** The corpus as a frame-bearing video table: one animated-GIF
    * container per doc, frame rasters derived deterministically from
    * doc_id, encoded with the JDK codec on the executors. */
  def videoMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaIds(s, dir) // spread: see pngMedia
      .mapPartitions { ids =>
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
        ids.map(id => (id, encodeVideo(writer, id)))
      }
      .toDF("doc_id", "payload")
  }

  /** Typed video-decode output: geometry from the container header,
    * pixel stats from the decoded raster of each SAMPLED frame —
    * `px_sum` is the proof real pixels came back out. */
  final case class VideoFrameStats(doc_id: Long, frame_no: Int,
      w: Int, h: Int, px_sum: Long, px_max: Int)

  /** Did this reader.read(i) throw the "no such frame" signal? The JDK
    * GIF reader's checkIndex raises the EXACT IndexOutOfBoundsException
    * class for an index past the last frame; its LZW decode raises the
    * ArrayIndexOutOfBoundsException SUBCLASS on a corrupt-but-
    * trailer-intact stream. Only the exact class may read as
    * end-of-frames — mid-stream corruption must flag like a missing
    * trailer does (rethrown → task failure), never silently ship the
    * frames decoded so far as if they were all of them. This contract
    * is the JDK reader's, which is why [[jdkGifReader]] pins that
    * implementation rather than taking the registry's first hit. */
  private[operators] def isEndOfFrames(e: IndexOutOfBoundsException): Boolean =
    e.getClass == classOf[IndexOutOfBoundsException]

  /** The JDK's own GIF reader, pinned BY CLASS from the ImageIO
    * registry: [[isEndOfFrames]]' exact-class contract is an
    * implementation detail of com.sun.imageio's GIFImageReader, and a
    * higher-priority third-party plugin on a deployment classpath
    * (e.g. TwelveMonkeys) would otherwise be handed back by
    * getImageReadersByFormatName("gif").next() with a DIFFERENT
    * past-the-last-frame signal — turning every healthy multi-frame
    * container into a task failure after its final frame. */
  private def jdkGifReader(): javax.imageio.ImageReader = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    var first: javax.imageio.ImageReader = null
    while (it.hasNext) {
      val r = it.next()
      if (r.getClass.getName.startsWith("com.sun.imageio.")) return r
      if (first == null) first = r
    }
    require(first != null, "no GIF ImageReader registered")
    first // no JDK reader registered at all: better one codec than none
  }

  /** Frame-sampled REAL video decode in ONE codec pass: the codegen'd
    * magic check qualifies containers at scan speed, then the
    * partition-batched decode opens each payload with the JDK's GIF
    * reader, seeks each SAMPLED frame by image index, and reads its
    * raster back out through the palette — the [[decodePng]] slot
    * that q_multimodal_frames' coordinate explode points at, now
    * decoding a real multi-frame format. Sampled-frame stats ship as
    * fixed-width columns; payloads never leave their partition and a
    * non-sampled frame's pixel data is never decompressed (GIF's LZW
    * blocks are per-frame — the reader walks block lengths to reach
    * a later index, the same seek-not-scan property that matters when
    * a frame is megabytes, not the fixture's bytes). */
  def decodeVideoFrames(media: DataFrame,
      every: Int = FrameSampleEvery): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media
      .filter(hex(substring(col("payload"), 1, 4)) === VidMagicHex)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one reader per PARTITION (reset + setInput per container):
        // the per-row ImageIO registry walk cost more than the tiny
        // fixture's decode itself
        val reader = jdkGifReader()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
        rows.flatMap { case (id, bytes) =>
          // ImageIO decodes a cut-off GIF best-effort; a truncated
          // media file must flag, not ship partial stats
          require(bytes.nonEmpty && bytes(bytes.length - 1) == GifTrailer,
            s"container of doc $id truncated (missing GIF trailer)")
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis)
            // NO getNumImages(true) pre-count: it walks every frame's
            // LZW blocks once just to size a loop the sampled reads
            // walk again. read(i) past the last frame raises
            // IndexOutOfBounds — that IS the frame count signal, at
            // zero extra block walking. Materialize before the reader
            // is reset — the result must not outlive the stream.
            val out = Seq.newBuilder[VideoFrameStats]
            var f = 1
            var more = true
            while (more) {
              val img =
                try Some(reader.read(f - 1))
                catch {
                  case e: IndexOutOfBoundsException if isEndOfFrames(e) =>
                    None
                }
              img match {
                case None => more = false
                case Some(img) =>
                  val w = img.getWidth
                  val h = img.getHeight
                  var sum = 0L
                  var mx = 0
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val v = img.getRGB(x, y) & 0xff
                      sum += v
                      if (v > mx) mx = v
                      x += 1
                    }
                    y += 1
                  }
                  out += VideoFrameStats(id, f, w, h, sum, mx)
                  f += every
              }
            }
            out.result()
          } finally {
            reader.reset()
            iis.close()
          }
        }
      }
      .toDF()
  }

  val all: Seq[QueryDef] = Seq(

    // Media dedup, both tiers: exact on the body content hash,
    // perceptual on the DECODED-pixel fingerprint (real ImageIO
    // decode feeds the phash) — the dedup pass a 100 TB media corpus
    // runs BEFORE any expensive model-based screening. The oracle
    // recomputes the raster checksum in closed form.
    QueryDef.sql(
      "q_multimodal_dedup",
      s"""WITH px AS (
         |  SELECT doc_id,
         |         CAST(doc_id % $PngW + 1 AS INTEGER) AS w,
         |         CAST(doc_id % $PngH + 1 AS INTEGER) AS h,
         |         $pxSumSql AS ps
         |  FROM documents),
         |m AS (
         |  SELECT d.doc_id, sha256(d.text) AS content_hash,
         |         md5(CAST(w AS VARCHAR) || ':' || CAST(h AS VARCHAR)
         |             || ':' || CAST(ps AS VARCHAR)) AS phash
         |  FROM documents d JOIN px ON d.doc_id = px.doc_id),
         |e AS (SELECT content_hash, CAST(min(doc_id) AS BIGINT) AS exact_keep
         |      FROM m GROUP BY 1),
         |p AS (SELECT phash, CAST(min(doc_id) AS BIGINT) AS phash_keep
         |      FROM m GROUP BY 1)
         |SELECT m.doc_id, m.content_hash, m.phash, e.exact_keep, p.phash_keep,
         |       m.doc_id <> e.exact_keep AS is_exact_dup,
         |       (m.doc_id = e.exact_keep AND m.doc_id <> p.phash_keep)
         |         AS is_near_dup
         |FROM m JOIN e USING (content_hash) JOIN p USING (phash)""".stripMargin) {
      (s, dir) =>
        mediaDedup(Tables(s, dir, "documents"), decodeFeatures(s, dir))
    },

    // REAL container-header parse: payloads carry an actual
    // PNG-shaped header (signature + big-endian IHDR dimensions) and
    // the gate validates the magic and decodes the dimension fields
    // with pure codegen'd byte arithmetic. The oracle DERIVES the
    // expected fields from doc_id independently (not by replaying
    // the parse), so the gate proves header-encode → header-parse is
    // the identity on every field — plus the byte count seam
    // (16-byte header + UTF-8 body).
    QueryDef.sql(
      "q_media_header",
      """SELECT doc_id, TRUE AS magic_ok,
        |       CAST(doc_id % 1000 + 1 AS BIGINT) AS width,
        |       CAST(doc_id % 777 + 1 AS BIGINT) AS height,
        |       CAST(16 + strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin) {
      (s, dir) => parseHeader(mediaWithHeader(s, dir))
    },

    // Content-addressed routing metadata over the opaque payload:
    // byte size, content hash, and the two shard keys a media store
    // actually routes on — a size bin (queue sizing / small-file
    // compaction policy) and a hash shard (storage spread). Pure
    // column ops at full scan speed; no decode, and no claim of one.
    QueryDef.sql(
      "q_multimodal_meta",
      """SELECT doc_id,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       sha256(text) AS content_hash,
        |       CAST(strlen(text) % 64 AS INTEGER) AS size_shard,
        |       CAST(CAST('0x' || substr(sha256(text), 1, 2) AS BIGINT)
        |            AS INTEGER) AS hash_shard
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "documents").select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
          .select(
            col("doc_id"),
            octet_length(col("payload")).as("n_bytes"),
            sha2(col("payload"), 256).as("content_hash"),
            (octet_length(col("payload")) % 64).as("size_shard"),
            conv(substring(sha2(col("payload"), 256), 1, 2), 16, 10)
              .cast("int").as("hash_shard"))
    },

    // Frame sampling off a PARSED container header: the frame count
    // is decoded from the payload's own header bytes (magic + 4-byte
    // big-endian count), the body is content-hashed after stripping
    // the header, and every 4th frame explodes into a work item —
    // the video analog of "explode the container into coordinates".
    // The payload never travels with the exploded rows — only
    // doc_id + frame_no + a per-frame key, so a 100 TB corpus
    // explodes into cheap coordinates, not copies. The REAL decode of
    // sampled frames is q_video_frame_decode below.
    QueryDef.sql(
      "q_multimodal_frames",
      """SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
        |       md5(sha256(text) || ':' || CAST(f AS VARCHAR)) AS frame_key
        |FROM documents,
        |     unnest(range(1, doc_id % 16 + 2, 4)) AS t(f)""".stripMargin) {
      (s, dir) =>
        videoWithHeader(s, dir)
          .select(col("doc_id"),
            conv(hex(substring(col("payload"), 5, 4)), 16, 10)
              .cast("int").as("n_frames"),
            sha2(substring(col("payload"), 9, Int.MaxValue), 256)
              .as("content_hash"))
          .select(col("doc_id"), col("content_hash"),
            explode(sequence(lit(1), col("n_frames"), lit(4))).as("frame_no"))
          .select(col("doc_id"), col("frame_no"),
            md5(concat(col("content_hash"), lit(":"),
              col("frame_no").cast("string"))).as("frame_key"))
    },

    // Resize planning over the REAL decoded dimensions — integer
    // fit-into-16 box math (16 < max(PngW, PngH), so both the
    // passthrough and the scaling branch execute), oracle-replicated
    // exactly from the generative dims.
    QueryDef.sql(
      "q_multimodal_resize",
      s"""WITH d AS (SELECT doc_id,
         |             CAST(doc_id % $PngW + 1 AS INTEGER) AS w,
         |             CAST(doc_id % $PngH + 1 AS INTEGER) AS h
         |           FROM documents)
         |SELECT doc_id, w AS width, h AS height,
         |       CAST(CASE WHEN greatest(w, h) <= 16 THEN w
         |                 ELSE w * 16 // greatest(w, h) END AS INTEGER)
         |         AS out_w,
         |       CAST(CASE WHEN greatest(w, h) <= 16 THEN h
         |                 ELSE h * 16 // greatest(w, h) END AS INTEGER)
         |         AS out_h
         |FROM d""".stripMargin) { (s, dir) =>
      resizeFeatures(s, dir, maxDim = 16)
    },

    // REAL waveform decode — the non-image modality. Genuine WAVs in
    // (RIFF/PCM16, JDK wave encoder on the executors), REAL decoded
    // PCM samples out, PLUS the codegen'd RIFF header parse riding
    // the same scan: magic_ok and the little-endian fmt-chunk rate
    // field prove header-encode → header-parse is the identity, while
    // sample_rate/n_samples/duration_us/peak_abs/abs_sum come from
    // the codec's decoded frames. The oracle recomputes every field
    // in closed form from the generative formula — a codec producing
    // any wrong sample anywhere in the corpus fails the abs_sum hash.
    // Container bytes are never hashed (RIFF chunk layout is a codec
    // detail); decoded samples are the contract.
    QueryDef.sql(
      "q_audio_stats",
      s"""WITH a AS (
         |  SELECT doc_id,
         |         CASE CAST(doc_id % 4 AS INTEGER)
         |           WHEN 0 THEN ${WavRates(0)} WHEN 1 THEN ${WavRates(1)}
         |           WHEN 2 THEN ${WavRates(2)} ELSE ${WavRates(3)}
         |         END AS rate,
         |         doc_id % $MaxWavSamples + 1 AS n
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         CAST(max(abs((doc_id * 31 + i * 17) % 65536 - 32768))
         |              AS INTEGER) AS peak_abs,
         |         CAST(sum(abs((doc_id * 31 + i * 17) % 65536 - 32768))
         |              AS BIGINT) AS abs_sum
         |  FROM a, unnest(range(0, n)) AS t(i)
         |  GROUP BY doc_id)
         |SELECT a.doc_id, TRUE AS magic_ok,
         |       CAST(rate AS INTEGER) AS hdr_rate,
         |       CAST(rate AS INTEGER) AS sample_rate,
         |       CAST(n AS BIGINT) AS n_samples,
         |       CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
         |       s.peak_abs, s.abs_sum
         |FROM a JOIN s ON a.doc_id = s.doc_id""".stripMargin) { (s, dir) =>
      // ONE pass over the payload bytes: the codegen'd header parse
      // rides the scan (keepPayload carries the bytes forward), then
      // the typed mapPartitions decode consumes the same rows — no
      // second encode pass, no corpus self-join to reattach fields.
      import s.implicits._
      parseWavHeader(wavMedia(s, dir), keepPayload = true)
        .as[(Long, Boolean, Int, Array[Byte])]
        .mapPartitions(rows => rows.map { case (id, ok, hdrRate, bytes) =>
          val f = decodeWavOne(id, bytes)
          (id, ok, hdrRate, f.sample_rate, f.n_samples, f.duration_us,
            f.peak_abs, f.abs_sum)
        })
        .toDF("doc_id", "magic_ok", "hdr_rate", "sample_rate",
          "n_samples", "duration_us", "peak_abs", "abs_sum")
    },

    // The mapPartitions decode path itself: genuine PNGs in, REAL
    // ImageIO-decoded pixels out. The oracle recomputes width,
    // height and the raster checksum in closed form from the
    // generative formula — if the codec (or the fixture's encoder)
    // produced any wrong pixel anywhere in the corpus, px_sum
    // hash-fails. Container bytes are never hashed (PNG encoding is
    // codec-version-dependent); decoded SAMPLES are the contract.
    QueryDef.sql(
      "q_multimodal_decode",
      s"""SELECT doc_id,
         |       CAST(doc_id % $PngW + 1 AS INTEGER) AS width,
         |       CAST(doc_id % $PngH + 1 AS INTEGER) AS height,
         |       $pxSumSql AS px_sum
         |FROM documents""".stripMargin) { (s, dir) =>
      decodeFeatures(s, dir)
    },

    // REAL frame-sampled video decode — the third modality. Raw
    // frame rasters in a synthetic container (no video codec ships
    // with the JDK; the container format is the fixture, the byte
    // decode is real), every 4th frame's pixels read back out by
    // offset seek on the executors. The oracle recomputes each
    // sampled frame's pixel sum and peak in closed form from the
    // generative formula — any wrong byte at any sampled offset
    // anywhere in the corpus fails the px_sum hash. Non-sampled
    // frames are never touched.
    QueryDef.sql(
      "q_video_frame_decode",
      s"""WITH v AS (
         |  SELECT doc_id,
         |         CAST(doc_id % $VidMaxFrames + 1 AS INTEGER) AS n_frames,
         |         CAST(doc_id % 5 + 2 AS INTEGER) AS w,
         |         CAST(doc_id % 3 + 2 AS INTEGER) AS h
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, w, h, CAST(fr AS INTEGER) AS frame_no
         |  FROM v, unnest(range(1, n_frames + 1, $FrameSampleEvery))
         |       AS t(fr))
         |SELECT doc_id, frame_no, w, h,
         |       CAST(sum((doc_id * 7 + 11 * frame_no + 3 * x + 5 * y)
         |                % 256) AS BIGINT) AS px_sum,
         |       CAST(max((doc_id * 7 + 11 * frame_no + 3 * x + 5 * y)
         |                % 256) AS INTEGER) AS px_max
         |FROM f, unnest(range(0, w)) AS tx(x), unnest(range(0, h)) AS ty(y)
         |GROUP BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      decodeVideoFrames(videoMedia(s, dir))
    }
  )
}
