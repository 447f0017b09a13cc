package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted by a batch decode step.
  *
  * The decode seam is REAL for images: [[decodeMedia]] routes payloads
  * carrying a known image signature through the JDK's built-in codecs
  * (`javax.imageio` — PNG, JPEG, GIF, BMP; no external dependency) and
  * reads TRUE pixel dimensions from the image header without a full
  * pixel decode. Payloads of any other format (video, audio, plain
  * text standing in for media in the test tables) fall back to
  * [[decodeStub]], which derives deterministic fake dimensions from
  * the byte length — the clearly-marked stub for codecs this
  * environment does not ship. Everything around the seam is the
  * production shape — binary column, typed Dataset, mapPartitions
  * batch processing (the Scala analogue of mapInPandas: amortize
  * per-batch codec setup across a partition), and a parquet-friendly
  * metadata struct.
  */
object MultimodalOps {

  final case class Blob(doc_id: Long, payload: Array[Byte])

  /** `width`/`height` are TRUE pixel dimensions when the payload decoded
    * through a real codec ([[decodeImage]], `codec` = the ImageIO format
    * name); deterministic byte-length-derived fakes under the stub
    * (`codec` = "stub").
    */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, codec: String, fingerprint: String)

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decode: stands in for the codecs this environment lacks
    * (video/audio). Deterministic on the payload bytes so results are
    * oracle-checkable.
    */
  def decodeStub(b: Blob): MediaMeta = {
    val n = b.payload.length.toLong
    MediaMeta(b.doc_id, n, n % 1024, (n * 7) % 768, "stub", md5Hex(b.payload))
  }

  /** Cheap signature sniff so the per-row hot path never constructs an
    * ImageIO stream for the overwhelmingly-common non-image payload:
    * PNG (PNG), JPEG (FF D8 FF), GIF (GIF8), BMP (BM + DIB check).
    *
    * BMP's 2-byte magic is the weak one — and the JDK's own
    * `BMPImageReaderSpi.canDecodeInput` checks nothing more, so a text
    * payload starting "BM" would sail through BOTH gates and reach
    * `getWidth`, surfacing garbage "real" dimensions parsed from
    * whatever bytes sit at the width/height offsets. Secondary check:
    * the DIB header-size u32 at offset 14 must be one of the published
    * header sizes.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean = p.length >= 4 && (
    (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
    (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
    (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
    (p(0) == 'B' && p(1) == 'M' && p.length >= 18 && {
      val dib = (p(14) & 0xFF) | ((p(15) & 0xFF) << 8) |
        ((p(16) & 0xFF) << 16) | ((p(17) & 0xFF) << 24)
      dib == 12 || dib == 16 || dib == 40 || dib == 52 || dib == 56 ||
        dib == 64 || dib == 108 || dib == 124
    }))

  /** REAL image decode through `javax.imageio` (JDK built-in — PNG,
    * JPEG, GIF, BMP): true pixel dimensions read from the image HEADER
    * (`ImageReader.getWidth/getHeight` parse metadata only — no pixel
    * decode, so a 50 MB JPEG costs a header read, the right cost model
    * for a 100 TB metadata-extraction pass). None when the payload is
    * not a decodable image (wrong format, or a truncated/corrupt header)
    * — the caller falls back to the stub rather than failing the batch.
    */
  def decodeImage(b: Blob): Option[MediaMeta] = {
    if (!looksLikeImage(b.payload)) return None
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some(MediaMeta(b.doc_id, b.payload.length.toLong,
            r.getWidth(0).toLong, r.getHeight(0).toLong,
            r.getFormatName.toLowerCase, md5Hex(b.payload)))
        } catch {
          // a signature match with a corrupt header must not fail the
          // whole partition — degrade to the stub path. NonFatal, not
          // just IOException: ImageIO readers throw unchecked exceptions
          // (IllegalArgument, IndexOutOfBounds, NegativeArraySize) on
          // malformed size fields behind a valid magic
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally in.close()
  }

  /** The production decode: real codec when the payload is an image,
    * stub otherwise. This is the function pipelines map — swapping in
    * further codecs (audio, video) means widening [[decodeImage]]'s
    * dispatch, never touching the pipeline shape around it.
    */
  def decodeMedia(b: Blob): MediaMeta = decodeImage(b).getOrElse(decodeStub(b))

  /** Audio metadata: true values from the container header when the
    * payload decoded ([[decodeAudio]]); `codec` = "stub" with
    * byte-derived fakes otherwise.
    */
  final case class AudioMeta(doc_id: Long, n_bytes: Long,
      sample_rate: Double, channels: Int, frames: Long, duration_ms: Long,
      codec: String, fingerprint: String)

  /** WAV (RIFF/WAVE), AIFF (FORM), AU (.snd) container signatures. */
  private def looksLikeAudio(p: Array[Byte]): Boolean = p.length >= 12 && (
    (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
    (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||
    (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** REAL audio decode through `javax.sound.sampled` (JDK built-in —
    * WAV, AIFF, AU): sample rate, channel count, and frame length read
    * from the container HEADER (`AudioSystem.getAudioFileFormat` parses
    * metadata only — no sample decode), duration derived exactly.
    * None for non-audio payloads and corrupt headers — callers fall
    * back to [[audioStub]] rather than failing the batch. Compressed
    * formats the JDK lacks (MP3, AAC, Opus) stay behind the stub seam,
    * same as video.
    */
  def decodeAudio(b: Blob): Option[AudioMeta] = {
    if (!looksLikeAudio(b.payload)) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(b.payload))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val rate = fmt.getSampleRate.toDouble
      Some(AudioMeta(b.doc_id, b.payload.length.toLong, rate,
        fmt.getChannels, frames,
        if (rate > 0 && frames >= 0) (frames * 1000.0 / rate).toLong else -1L,
        aff.getType.toString.toLowerCase, md5Hex(b.payload)))
    } catch {
      // same NonFatal discipline as decodeImage: container parsers can
      // throw unchecked on malformed size/offset fields behind a valid
      // magic, and a corrupt payload must never fail the batch
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic byte-derived fake for non-audio payloads — the same
    * oracle-checkable stub contract as [[decodeStub]].
    */
  def audioStub(b: Blob): AudioMeta = {
    val n = b.payload.length.toLong
    AudioMeta(b.doc_id, n, 8000.0, 1 + (n % 2).toInt, n, n * 1000 / 8000,
      "stub", md5Hex(b.payload))
  }

  /** The production audio dispatch, mirroring [[decodeMedia]]. */
  def decodeAudioOrStub(b: Blob): AudioMeta =
    decodeAudio(b).getOrElse(audioStub(b))

  /** Video container metadata: true values parsed from the ISO-BMFF
    * (MP4/MOV) box structure when the payload carries one
    * ([[decodeVideo]], `codec` = "mp4"); byte-derived fakes under the
    * stub. `duration_ms` is `mvhd` duration over its timescale;
    * `width`/`height` are the largest track's `tkhd` 16.16 fixed-point
    * dimensions (audio tracks carry 0x0, so max-over-tracks is the
    * video track).
    */
  final case class VideoMeta(doc_id: Long, n_bytes: Long,
      major_brand: String, timescale: Long, duration_ms: Long,
      width: Long, height: Long, codec: String, fingerprint: String)

  /** ISO-BMFF signature: a leading `ftyp` box (the standard layout —
    * exotic files without one stay behind the stub seam).
    */
  private def looksLikeMp4(p: Array[Byte]): Boolean = p.length >= 12 &&
    p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  /** REAL MP4/ISO-BMFF container metadata by PURE BYTE PARSING — no
    * codec dependency, same pattern as the WAV/AIFF header readers:
    * walk the box tree (u32 size + fourcc type, `size == 1` -> 64-bit
    * largesize, `size == 0` -> to end-of-enclosure), read `moov/mvhd`
    * (version 0 and 1 layouts) for timescale + duration and every
    * `moov/trak/tkhd` for 16.16 fixed-point width/height. This is
    * container METADATA extraction — the right cost model for a 100 TB
    * curation pass (duration/resolution filters never decode a frame);
    * actual frame decode stays behind the stub seam (no ffmpeg in this
    * environment). None for non-BMFF payloads and corrupt/truncated
    * boxes — callers fall back to [[videoStub]], never fail the batch.
    *
    * Reference behavior covered: the reference treats media files as
    * opaque uploads (file_submission_processor.py routes by extension
    * only); this surfaces the metadata a training-data pipeline
    * actually filters on.
    */
  def decodeVideo(b: Blob): Option[VideoMeta] = {
    if (!looksLikeMp4(b.payload)) return None
    val p = b.payload
    def u16(o: Int): Long = ((p(o) & 0xFFL) << 8) | (p(o + 1) & 0xFFL)
    def u32(o: Int): Long = (u16(o) << 16) | u16(o + 2)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    /** (fourcc, payloadStart, boxEnd) for each box in [start, end). */
    def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var at = start
        def hasNext: Boolean = at + 8 <= end
        def next(): (String, Int, Int) = {
          val size = u32(at)
          val typ = new String(p, at + 4, 4, "ISO-8859-1")
          val (payload, rawEnd) =
            if (size == 1L && at + 16 <= end) {
              val ls = u64(at + 8)
              (at + 16, at + math.min(ls, (end - at).toLong).toInt)
            }
            else if (size == 0L) (at + 8, end)
            else (at + 8, at + math.min(size max 8L, (end - at).toLong).toInt)
          // PROGRESS GUARANTEE: a malformed size (largesize < 16,
          // negative, truncated) must not stall the walk — a hung
          // executor task is worse than the degrade the NonFatal
          // catch provides, and a catch cannot save a non-throwing
          // loop. Clamp past the header we just consumed.
          val boxEnd = math.max(rawEnd, payload)
          at = boxEnd
          (typ, payload, boxEnd)
        }
      }
    try {
      val top = boxes(0, p.length).toSeq
      val brandOpt = top.collectFirst {
        case ("ftyp", ps, be) if ps + 4 <= be =>
          new String(p, ps, 4, "ISO-8859-1").trim
      }
      val moovOpt = top.collectFirst { case ("moov", ps, be) => (ps, be) }
      for {
        brand <- brandOpt
        (moovStart, moovEnd) <- moovOpt
        moov = boxes(moovStart, moovEnd).toSeq
        (timescale, duration) <- moov.collectFirst {
          case ("mvhd", ps, be) if ps + 4 <= be =>
            if (p(ps) == 1) (u32(ps + 20), u64(ps + 24)) // v1: 64-bit times
            else (u32(ps + 12), u32(ps + 16))            // v0: 32-bit
        }
      } yield {
        // width/height are the LAST 8 bytes of each tkhd box (both
        // versions end ...matrix[36], width u32, height u32, as 16.16)
        val dims = moov.iterator
          .collect { case ("trak", ps, be) => (ps, be) }
          .flatMap { case (ps, be) => boxes(ps, be) }
          .collect { case ("tkhd", ps, be) if be - 8 >= ps =>
            (u32(be - 8) >> 16, u32(be - 4) >> 16) }
          .toSeq
        val (w, h) =
          if (dims.isEmpty) (0L, 0L) else dims.maxBy(d => d._1 * d._2)
        val durMs = if (timescale > 0) duration * 1000L / timescale else -1L
        VideoMeta(b.doc_id, p.length.toLong, brand, timescale, durMs,
          w, h, "mp4", md5Hex(p))
      }
    } catch {
      // same NonFatal discipline as the other decoders: malformed
      // size/offset fields behind a valid magic must degrade, not fail
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic byte-derived fake for non-video payloads — the same
    * oracle-checkable stub contract as [[decodeStub]]/[[audioStub]].
    */
  def videoStub(b: Blob): VideoMeta = {
    val n = b.payload.length.toLong
    VideoMeta(b.doc_id, n, "stub", 1000L, n, n % 1920, (n * 7) % 1080,
      "stub", md5Hex(b.payload))
  }

  /** The production video dispatch, mirroring [[decodeMedia]]. */
  def decodeVideoOrStub(b: Blob): VideoMeta =
    decodeVideo(b).getOrElse(videoStub(b))

  final case class FrameMeta(doc_id: Long, frame_idx: Long, n_chars: Long,
      fingerprint: String)

  /** STUB frame sampler: stands in for a video keyframe extractor. Treats
    * the payload as fixed-size "frames" (100-byte chunks) and keeps every
    * 2nd one — the 1→N decode shape (flatMap inside mapPartitions, batch
    * setup amortized per partition) that a real ffmpeg-style sampler needs.
    */
  def frameSampleStub(b: Blob, frameSize: Int = 100, stride: Int = 2): Iterator[FrameMeta] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    b.payload.grouped(frameSize).zipWithIndex.collect {
      case (chunk, i) if i % stride == 0 =>
        FrameMeta(b.doc_id, i.toLong, chunk.length.toLong,
          md.digest(chunk).map("%02x".format(_)).mkString)
    }
  }

  /** Resize metadata: target dims preserving aspect ratio under a max
    * edge — the metadata contract of an image-resize stage. Operates on
    * whatever dimensions the decode produced (real or stub).
    */
  def resizeStub(m: MediaMeta, maxEdge: Long = 256): (Long, Long) = {
    val (w, h) = (math.max(m.width, 1L), math.max(m.height, 1L))
    val scale = maxEdge.toDouble / math.max(w, h)
    if (scale >= 1.0) (w, h)
    else (math.max((w * scale).toLong, 1L), math.max((h * scale).toLong, 1L))
  }

  def qs: Seq[Q] = Seq(
    // ---- 1→N frame sampling: explode each payload into sampled frames ----
    Q("q76_frame_sample",
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[Blob]
        blobs.mapPartitions(_.flatMap(b => frameSampleStub(b))).toDF()
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH idx AS (SELECT doc_id, text,
             |  unnest(range(0, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS f
             |  FROM documents),
             |frames AS (SELECT doc_id, f,
             |  substr(text, CAST(f * 100 + 1 AS INT), 100) AS chunk
             |  FROM idx WHERE f % 2 = 0)
             |SELECT doc_id, f AS frame_idx,
             |  CAST(length(chunk) AS BIGINT) AS n_chars,
             |  md5(chunk) AS fingerprint
             |FROM frames ORDER BY doc_id, frame_idx""".stripMargin),
      "pipeline-op: multimodal frame sampling (1→N batch decode, stubbed codec)"),

    Q("q52_multimodal_decode",
      (s, d) => {
        import s.implicits._
        // text bytes stand in for a media payload (opaque binary column)
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[Blob]
        // mapPartitions = per-batch decode: one codec instance per partition,
        // not per row. decodeMedia is the REAL dispatch — text payloads carry
        // no image signature, so this table exercises the stub arm; the
        // javax.imageio arm is spec-pinned on planted PNG/JPEG bytes
        // (MultimodalSpec)
        blobs.mapPartitions(_.map(decodeMedia)).toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  octet_length(encode(text)) % 1024 AS width,
             |  (octet_length(encode(text)) * 7) % 768 AS height,
             |  'stub' AS codec,
             |  md5(text) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: multimodal binary column + mapPartitions batch decode (javax.imageio for images, stub otherwise)")
  )
}
