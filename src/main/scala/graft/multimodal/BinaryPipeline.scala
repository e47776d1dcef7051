package graft.multimodal

import graft.signatures.{Codec, Sig}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column processing: images/audio/video as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch functions (the Scala twin of a Pandas-UDF/mapInPandas stage).
  *
  * The DECODE seam is pluggable: this sandbox has no image/audio
  * libraries (zero egress), so the only real codecs are the corpus's
  * internal "ppm"/"qnt" formats; every other fmt goes through
  * [[StubCodec]], which is clearly marked and produces a
  * deterministic fake so the Spark-side plumbing (schema, batching,
  * partitioning, feature shapes) is real and testable. In production
  * the stub is replaced by a JNI/javacpp decoder behind the same
  * trait.
  *
  * Scale notes: every operator here is a NARROW mapPartitions — no
  * shuffle; `bytes` is the dominant column, so downstream consumers
  * must select away from it as soon as features are extracted (column
  * pruning keeps later scans narrow).
  */
object BinaryPipeline {

  /** Decoded raw frame: 8-bit RGB. */
  final case class Frame(w: Int, h: Int, rgb: Array[Byte])

  /** The decode seam. */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Frame
  }

  /** Real codec for the corpus's internal formats. */
  object PpmCodec extends MediaCodec {
    def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Frame =
      Frame(w, h, Codec.decode(bytes, fmt))
  }

  /** STUB — stands in for libjpeg/ffmpeg etc., which do not exist in
    * this sandbox. Produces a deterministic pseudo-image from the byte
    * content so pipelines are end-to-end testable; NOT a real decoder.
    */
  object StubCodec extends MediaCodec {
    def decode(bytes: Array[Byte], fmt: String, w: Int, h: Int): Frame = {
      val seed = Sig.hash64(bytes)
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < rgb.length) {
        rgb(i) = ((Sig.mix64(seed + i) >>> 32) & 0xff).toByte
        i += 1
      }
      Frame(w, h, rgb)
    }
  }

  def codecFor(fmt: String): MediaCodec = fmt match {
    case "ppm" | "qnt" => PpmCodec
    case _ => StubCodec // jpeg/png/wav/mp4/... — see StubCodec scaladoc
  }

  final case class MediaFeatures(
      media_id: String,
      fmt: String,
      mean_r: Double, mean_g: Double, mean_b: Double,
      std_lum: Double,
      phash: Long)

  /** Feature extraction: decode + per-channel means + luminance std +
    * phash, one narrow pass, batched per partition. Input needs
    * columns (image_id, bytes, w, h, fmt). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          val f = codecFor(fmt).decode(bytes, fmt, w, h)
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          var sl = 0.0; var sl2 = 0.0
          val n = f.w * f.h
          var p = 0
          while (p < n) {
            val r = f.rgb(p * 3) & 0xff
            val g = f.rgb(p * 3 + 1) & 0xff
            val b = f.rgb(p * 3 + 2) & 0xff
            sr += r; sg += g; sb += b
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sl += l; sl2 += l * l
            p += 1
          }
          val meanL = sl / n
          MediaFeatures(id, fmt, sr / n, sg / n, sb / n,
            math.sqrt(math.max(0, sl2 / n - meanL * meanL)),
            Codec.phash(f.w, f.h, f.rgb))
        }
      }
  }

  /** Nearest-neighbor resize to (tw x th), re-encoded as "ppm" —
    * the thumbnail stage. Narrow; output schema mirrors the input. */
  def resize(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          val f = codecFor(fmt).decode(bytes, fmt, w, h)
          val out = new Array[Byte](tw * th * 3)
          var y = 0
          while (y < th) {
            val sy = y * f.h / th
            var x = 0
            while (x < tw) {
              val sx = x * f.w / tw
              var c = 0
              while (c < 3) {
                out((y * tw + x) * 3 + c) = f.rgb((sy * f.w + sx) * 3 + c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          (id, Codec.encodePpm(tw, th, out), tw, th, "ppm")
        }
      }
      .toDF("image_id", "bytes", "w", "h", "fmt")
  }

  /** Driver query (`q_media_features`): the video path end-to-end —
    * synthesize one deterministic multi-frame "video" per document
    * (concatenated 16x16 ppm frames whose pixel grid is a closed-form
    * gradient of (doc_id, frame_idx)), run the REAL operators
    * ([[sampleFrames]] at stride 2, then [[extractFeatures]]), and
    * aggregate per item: sampled-frame count, mean luminance, min/max
    * perceptual hash. Because every frame is the gradient
    * v(x,y) = c + sy*y + sx*x on all three channels, the frame's mean
    * luma (c + 7.5*(sy+sx)) and its average-hash bits
    * (sy*(2*by-7) + sx*(2*bx-7) > 0 per 8x8 cell) have exact
    * closed forms DuckDB recomputes independently — so the whole
    * decode → luma → phash chain is hash-oracled, not just rows-only.
    * The (sy, sx) table keeps sy odd and sx even (every cell's
    * above-mean margin is then >= 1 luma unit — no FP-tie bit flips)
    * and sy+sx < 0 (bit 63 never set — the packed hash fits a signed
    * BIGINT on both engines). Every stage is narrow except the final
    * per-item groupBy. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = 16; val h = 16
    val videos = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long]
      .map { id =>
        val n = 1 + (id % 5).toInt
        val frames = (0 until n).map { i =>
          // base 105 keeps v in [0, 181] for every combo below (worst
          // negative reach is sy*15 + sx*15 = -105 at (-3, -4))
          val c = (105 + (id * 37 + i * 11) % 32).toInt
          val (sy, sx) = GradientCombos(((id + i) % 8).toInt)
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (c + sy * y + sx * x).toByte
              val p = (y * w + x) * 3
              rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
              x += 1
            }
            y += 1
          }
          Codec.encodePpm(w, h, rgb)
        }
        val blob = new Array[Byte](frames.iterator.map(_.length).sum)
        var off = 0
        frames.foreach { f =>
          System.arraycopy(f, 0, blob, off, f.length); off += f.length
        }
        ("vid_" + id, blob)
      }
      .toDF("image_id", "bytes")
    val feats = extractFeatures(sampleFrames(videos, w, h, stride = 2)).toDF()
    feats.groupBy(col("media_id").as("image_id"))
      .agg(count(lit(1)).as("n_frames"),
        round(avg(lit(0.299) * col("mean_r") + lit(0.587) * col("mean_g")
          + lit(0.114) * col("mean_b")), 3).as("mean_luma"),
        min(col("phash")).as("min_phash"),
        max(col("phash")).as("max_phash"))
  }

  /** (sy, sx) gradient slopes for [[mediaFeatures]]: sy odd, sx even,
    * sy + sx < 0 — see the scaladoc above for why. */
  private[graft] val GradientCombos: Array[(Int, Int)] =
    Array((1, -2), (1, -4), (3, -4), (-1, -2), (-1, -4), (-3, -2), (-3, -4), (3, -6))

  /** Frame sampling for "video" = concatenated fixed-size ppm frames
    * in one binary blob: emit every `stride`-th frame as its own row.
    * A narrow flatMap — the per-row fan-out pattern for multi-frame
    * media. */
  def sampleFrames(video: DataFrame, frameW: Int, frameH: Int, stride: Int): DataFrame = {
    val spark = video.sparkSession
    import spark.implicits._
    val frameBytes = Codec.encodePpm(frameW, frameH, new Array[Byte](frameW * frameH * 3)).length
    video.select("image_id", "bytes")
      .as[(String, Array[Byte])]
      .flatMap { case (id, blob) =>
        val n = blob.length / frameBytes
        (0 until n by stride).map { i =>
          val frame = java.util.Arrays.copyOfRange(blob, i * frameBytes, (i + 1) * frameBytes)
          (id, i, frame, frameW, frameH, "ppm")
        }
      }
      .toDF("image_id", "frame_idx", "bytes", "w", "h", "fmt")
  }
}
