package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batched partition passes.
  *
  * The decode step itself is STUBBED (no image/audio libs in this
  * container): `FakeDecoder` produces deterministic features from the raw
  * bytes. Everything around it — schema, batch shape, partition-parallel
  * execution, feature-vector output — is real: swap `Decoder` for a JNI/
  * Pandas-UDF-backed implementation and the pipeline is production-shaped.
  *
  * Scale notes: payloads stay columnar binary (parquet keeps them out of
  * unrelated scans via column pruning); decode runs once per partition
  * batch (amortizing model/codec init, the reason mapInPandas-style
  * batching exists); features are fixed-width arrays, friendly to
  * downstream vectorized ops.
  */
object Multimodal {

  val BatchSize = 64

  /** Media metadata carried alongside the payload. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_chars", LongType)))

  /** Wrap a text column as a fake media payload (UTF-8 bytes) + metadata —
    * the test-data stand-in for real image/audio bytes.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"), length(col(textCol)).cast("long").as("n_chars")).as("meta"))

  /** Decoder contract: bytes-batch in, features-batch out. Batched so real
    * implementations amortize per-batch codec/model setup.
    */
  trait Decoder extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaFeatures]
  }

  final case class MediaFeatures(nBytes: Long, checksum: Long, embedding: Array[Float])

  /** Deterministic stand-in for the real decoder (marked stub): checksum is
    * a rolling byte hash, the "embedding" is a 4-bin byte histogram.
    */
  object FakeDecoder extends Decoder {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaFeatures] =
      payloads.map { b =>
        var cs = 0L
        val hist = new Array[Float](4)
        var i = 0
        while (i < b.length) {
          cs = (cs * 31 + (b(i) & 0xff)) & 0xffffffffL
          hist((b(i) & 0xff) % 4) += 1f
          i += 1
        }
        MediaFeatures(b.length.toLong, cs, hist)
      }
  }

  /** Partition-parallel batched decode: payload column → feature columns. */
  def decodeFeatures(df: DataFrame, payloadCol: String,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema
      .add("n_bytes", LongType)
      .add("checksum", LongType)
      .add("features", ArrayType(FloatType))
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](idx)))
        batch.lazyZip(feats).map { (row, f) =>
          Row.fromSeq(row.toSeq ++ Seq(f.nBytes, f.checksum, f.embedding.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** "Frame sampling" stub: every k-th byte of the payload as a frame
    * marker — the partitioning/explode shape of real video frame extraction.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), floor((octet_length(col(payloadCol)) - 1) / every).cast("int"))))
      .withColumn("frame_byte",
        expr(s"substring($payloadCol, frame_idx * $every + 1, 1)"))

  /** "Resize" stub: payload → smaller payload (every k-th byte) with the
    * metadata rewritten — the binary→binary transform shape of a real image
    * resize (decode → scale → re-encode per batch; a real implementation
    * swaps the body of the loop, the batched partition pass stays).
    */
  def resize(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema
      .add("payload_resized", BinaryType)
      .add("n_resized", LongType)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val b = row.getAs[Array[Byte]](idx)
          if (b == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
          else {
            val out = new Array[Byte]((b.length + factor - 1) / factor)
            var i = 0
            while (i < out.length) { out(i) = b(i * factor); i += 1 }
            Row.fromSeq(row.toSeq ++ Seq(out, out.length.toLong))
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}
