package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batched partition passes.
  *
  * IMAGES decode for real: `decodeImages`/`resizeImages` run JDK-only
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with the JDK — no external
  * media libs needed), producing true dimensions, band counts, and pixel
  * hashes, with a deterministic PNG fixture generator (`imageFixture`) that
  * makes the whole decode→transform→re-encode path oracle-checkable.
  * AUDIO decodes for real too: `decodeAudio` runs JDK-only
  * `javax.sound.sampled` (WAV/AIFF/AU parsers ship with the JDK) over the
  * `audioFixture` deterministic PCM WAVs. The VIDEO decode step remains
  * stubbed (no codec libs in this container): `FakeDecoder` produces
  * deterministic features from the raw bytes, and everything around it —
  * schema, batch shape, partition-parallel execution, feature-vector
  * output — is real: swap `Decoder` for a JNI/Pandas-UDF-backed
  * implementation and the pipeline is production-shaped.
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

  // ---------------- real image path (JDK javax.imageio) ----------------

  /** Deterministic grayscale PNG per id — the oracle-checkable image
    * fixture: width `8 + id%13`, height `8 + id%7`, pixel at row-major
    * index `i` = `(id·31 + i) mod 256`. PNG is lossless, so a correct
    * decoder recovers exactly these samples — which a SQL oracle can
    * recompute from `id` alone, closing the loop on REAL codec work
    * without shipping binary fixtures. Output: (idCol, png).
    */
  def imageFixture(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("png", BinaryType)))
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file cache per image
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          val w = (8 + math.floorMod(id, 13)).toInt
          val h = (8 + math.floorMod(id, 7)).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                math.floorMod(id * 31 + y.toLong * w + x, 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image decode (JDK `javax.imageio`): payload → true width, height,
    * band count, and an order-sensitive pixel hash
    * `Σ (i+1)·sample₀(i)` over row-major band-0 samples. Unreadable or
    * null payloads yield null features (a production pipeline quarantines
    * them rather than failing the batch). Batched partition pass, same
    * shape as [[decodeFeatures]].
    */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema
      .add("width", LongType)
      .add("height", LongType)
      .add("channels", IntegerType)
      .add("pix_hash", LongType)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val b = row.getAs[Array[Byte]](idx)
          val img =
            if (b == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) Row.fromSeq(row.toSeq ++ Seq(null, null, null, null))
          else {
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            var hash = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                hash += (y.toLong * w + x + 1) * raster.getSample(x, y, 0)
                x += 1
              }
              y += 1
            }
            // Seq[Any], not Seq(...): numeric inference would widen the Int
            // band count to Long and break the external-type check
            Row.fromSeq(row.toSeq ++
              Seq[Any](w.toLong, h.toLong, raster.getNumBands, hash))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize: decode (`javax.imageio`), nearest-neighbor
    * downsample by `factor` on band 0 (`out(x,y) = in(x·factor, y·factor)`,
    * output dims `⌈dim/factor⌉` — integer sampling, so the result is
    * bit-deterministic across JVMs, unlike interpolating Graphics2D
    * scaling), re-encode as grayscale PNG. Output: input columns +
    * `png_resized`. Unreadable/null payloads carry a null result.
    */
  def resizeImages(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resize factor must be positive")
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add("png_resized", BinaryType)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val b = row.getAs[Array[Byte]](idx)
          val img =
            if (b == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) Row.fromSeq(row.toSeq :+ null)
          else {
            val inR = img.getRaster
            val ow = (img.getWidth + factor - 1) / factor
            val oh = (img.getHeight + factor - 1) / factor
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val outR = out.getRaster
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                outR.setSample(x, y, 0, inR.getSample(x * factor, y * factor, 0))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row.fromSeq(row.toSeq :+ bos.toByteArray)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---------------- real audio path (JDK javax.sound) ----------------

  /** Deterministic mono 16-bit PCM WAV per id — the audio analog of
    * [[imageFixture]]: sample rate `8000 + (id%3)·4000`, length
    * `64 + id%50` samples, sample at index `i` =
    * `((id·7919 + i·104729) mod 65536) − 32768` (spans the full signed
    * range). PCM WAV is lossless and the container is a fixed RIFF layout,
    * so a correct decoder recovers exactly these samples — recomputable by
    * a SQL oracle from `id` alone. Output: (idCol, wav).
    */
  def audioFixture(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long").as(idCol))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("wav", BinaryType)))
    in.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          val rate = (8000 + math.floorMod(id, 3) * 4000).toInt
          val n = (64 + math.floorMod(id, 50)).toInt
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2) // byte rate
            .putShort(2).putShort(16) // block align, bits
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) {
            bb.putShort((math.floorMod(id * 7919 + i.toLong * 104729, 65536) - 32768).toShort)
            i += 1
          }
          Row(id, bb.array())
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio decode (JDK `javax.sound.sampled` — WAV/AIFF/AU parsers
    * ship with the JDK): payload → true sample rate, channel count, frame
    * count, an order-sensitive sample hash `Σ (i+1)·s(i)` over channel-0
    * 16-bit samples, and the peak amplitude. Unreadable or null payloads
    * yield null features (quarantine, don't fail the batch). Batched
    * partition pass, same shape as [[decodeImages]].
    */
  def decodeAudio(df: DataFrame, payloadCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema
      .add("sample_rate", LongType)
      .add("channels", IntegerType)
      .add("n_samples", LongType)
      .add("pcm_hash", LongType)
      .add("peak", LongType)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val b = row.getAs[Array[Byte]](idx)
          val decoded: Option[(Long, Int, Long, Long, Long)] =
            if (b == null) None
            else try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(b))
              try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16) None
                else {
                  val bytes = ais.readAllBytes()
                  val bb = java.nio.ByteBuffer.wrap(bytes).order(
                    if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                    else java.nio.ByteOrder.LITTLE_ENDIAN)
                  val ch = fmt.getChannels
                  val nFrames = bytes.length / (2 * ch)
                  var hash = 0L
                  var peak = 0L
                  var i = 0
                  while (i < nFrames) {
                    val s = bb.getShort(i * 2 * ch).toLong // channel 0
                    hash += (i + 1) * s
                    if (math.abs(s) > peak) peak = math.abs(s)
                    i += 1
                  }
                  Some((fmt.getSampleRate.toLong, ch, nFrames.toLong, hash, peak))
                }
              } finally ais.close()
            } catch { case _: Exception => None }
          decoded match {
            case Some((rate, ch, n, hash, peak)) =>
              Row.fromSeq(row.toSeq ++ Seq[Any](rate, ch, n, hash, peak))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL audio resample (decimation): decode (`javax.sound.sampled`),
    * keep every `factor`-th channel-0 sample (`out(i) = in(i·factor)` —
    * integer selection, bit-deterministic across JVMs, the audio analog of
    * [[resizeImages]]'s nearest-neighbor grid), re-encode as mono 16-bit
    * PCM WAV at `rate/factor`. Output: input columns + `wav_resampled`.
    * Unreadable/null payloads carry a null result.
    */
  def resampleAudio(df: DataFrame, payloadCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resample factor must be positive")
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add("wav_resampled", BinaryType)
    df.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val b = row.getAs[Array[Byte]](idx)
          val out: Array[Byte] =
            if (b == null) null
            else try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(b))
              try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16) null
                else {
                  val bytes = ais.readAllBytes()
                  val bb = java.nio.ByteBuffer.wrap(bytes).order(
                    if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                    else java.nio.ByteOrder.LITTLE_ENDIAN)
                  val ch = fmt.getChannels
                  val nFrames = bytes.length / (2 * ch)
                  val outN = (nFrames + factor - 1) / factor
                  val outRate = math.max(1, fmt.getSampleRate.toInt / factor)
                  val dataLen = outN * 2
                  val ob = java.nio.ByteBuffer.allocate(44 + dataLen)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  ob.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
                    .put("WAVE".getBytes("US-ASCII"))
                    .put("fmt ".getBytes("US-ASCII")).putInt(16)
                    .putShort(1).putShort(1)
                    .putInt(outRate).putInt(outRate * 2)
                    .putShort(2).putShort(16)
                    .put("data".getBytes("US-ASCII")).putInt(dataLen)
                  var i = 0
                  while (i < outN) {
                    ob.putShort(bb.getShort(i * factor * 2 * ch))
                    i += 1
                  }
                  ob.array()
                }
              } finally ais.close()
            } catch { case _: Exception => null }
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }(Encoders.row(outSchema))
  }

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
