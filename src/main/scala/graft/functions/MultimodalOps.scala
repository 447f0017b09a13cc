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

  def qs: Seq[Q] = Seq(
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
