package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted by a batch decode step.
  *
  * The decode itself is a clearly-marked STUB (no image/audio codecs in
  * this environment): [[MultimodalOps.decodeStub]] derives deterministic
  * fake dimensions from the payload bytes. Everything AROUND the stub is
  * the real production shape — binary column, typed Dataset, mapPartitions
  * batch processing (the Scala analogue of mapInPandas: amortize per-batch
  * codec setup across a partition), and a parquet-friendly metadata struct.
  */
object MultimodalOps {

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
      fake_height: Long, fingerprint: String)

  /** STUB decode: stands in for an image/audio decoder. Deterministic on
    * the payload bytes so results are oracle-checkable; swap the body for a
    * real codec (e.g. javax.imageio) without touching the pipeline shape.
    */
  def decodeStub(b: Blob): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(b.payload).map("%02x".format(_)).mkString
    val n = b.payload.length.toLong
    MediaMeta(b.doc_id, n, n % 1024, (n * 7) % 768, hex)
  }

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

  /** STUB resize: target dims preserving aspect ratio under a max edge —
    * the metadata contract of an image-resize stage, minus the codec.
    */
  def resizeStub(m: MediaMeta, maxEdge: Long = 256): (Long, Long) = {
    val (w, h) = (math.max(m.fake_width, 1L), math.max(m.fake_height, 1L))
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
        // not per row (the expensive-setup pattern real decoders need)
        blobs.mapPartitions(_.map(decodeStub)).toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  octet_length(encode(text)) % 1024 AS fake_width,
             |  (octet_length(encode(text)) * 7) % 768 AS fake_height,
             |  md5(text) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      "pipeline-op: multimodal binary column + mapPartitions batch decode (stubbed codec)")
  )
}
