package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark side — schema, partitioning,
  * batched per-partition transform shape — is real and tested; the
  * actual codec step is STUBBED behind a deterministic fake (this
  * container has no image/audio libraries), clearly marked below.
  */
object Multimodal {

  /** Typed media row: payload + sidecar metadata. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, durationMs: Int)

  final case class Feature(doc_id: Long, kind: String, nBytes: Long,
                           meanByte: Double, width: Int, height: Int,
                           thumbBytes: Array[Byte])

  /** Deterministic fake corpus: payload bytes derived from doc_id. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(spark.sparkContext.defaultParallelism, 4)).map { id =>
      val rng = new scala.util.Random(77L + id)
      val kind = Vector("image", "audio", "video")((id % 3).toInt)
      val len = 256 + rng.nextInt(1024)
      val payload = Array.fill(len)(rng.nextInt(256).toByte)
      MediaRow(id, kind, payload, 16 + rng.nextInt(64), 16 + rng.nextInt(64),
        if (kind == "image") 0 else 1000 + rng.nextInt(60000))
    }
  }

  /** STUB DECODE: a real deployment would invoke an image codec here
    * (per-partition, reusing decoder instances — same batching shape as
    * ExtractJob.ExtractCtx). The fake is deterministic: "decoding"
    * computes byte statistics and a fixed-size "thumbnail" by strided
    * byte sampling, standing in for resize(w, h).
    */
  def decodeAndFeaturize(media: Dataset[MediaRow], thumbSize: Int = 64): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition arena slot (a real codec handle would live here)
      it.map { m =>
        val bytes = m.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
        val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        val stride = math.max(1, bytes.length / thumbSize)
        val thumb = (0 until math.min(thumbSize, bytes.length))
          .map(j => bytes(j * stride % bytes.length)).toArray
        Feature(m.doc_id, m.kind, bytes.length.toLong, mean, m.width, m.height, thumb)
      }
    }
  }

  /** Frame sampling for video rows: k evenly spaced "frames" (stub:
    * fixed-width byte slices). Output explodes one row per frame —
    * the real shape of a frame-extraction stage.
    */
  def frameSample(media: Dataset[MediaRow], k: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = m.payload.length
      val frame = math.max(1, n / k)
      (0 until k).map { f =>
        val start = f * frame
        val end = math.min(n, start + frame)
        (m.doc_id, f, java.util.Arrays.copyOfRange(m.payload, start, end))
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
