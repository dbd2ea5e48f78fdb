package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2B L4): media as opaque binary
  * columns + typed metadata, with decode/feature-extraction plumbed
  * through `mapPartitions` on a typed Dataset.
  *
  * ==== STUB NOTICE ====
  * Real image/audio/video codecs are NOT available in this container, so
  * [[FakeCodec]] below is a clearly-marked deterministic stand-in: it
  * derives "decoded" dimensions/duration from a digest of the payload
  * bytes. The Spark-side plumbing — schema, typed encoders, partition
  * batching, feature struct shape — is real and tested; swapping
  * `FakeCodec` for javacv/ffmpeg bindings is a one-object change.
  *
  * Scale shape: decode is per-row CPU work inside `mapPartitions`
  * (no shuffle); callers should `repartition` first if payload sizes are
  * skewed so each task gets a balanced byte budget.
  */
object Multimodal {

  case class MediaRow(id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Long, digest: String,
      width: Int, height: Int, duration_ms: Long, frames_sampled: Array[Long])

  /** Deterministic fake decoder — see STUB NOTICE above. */
  object FakeCodec {
    def digestOf(bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(bytes).map("%02x".format(_)).mkString
    }
    /** "Decode": dimensions/duration are pure functions of the digest. */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Long) =
      decodeFromDigest(kind, digestOf(bytes))

    /** Same, for callers that already hashed the payload — the feature
      * extractor needs the digest as an output column anyway, and
      * re-hashing a multi-KB payload per row doubles the decode cost. */
    def decodeFromDigest(kind: String, digest: String): (Int, Int, Long) = {
      val h = java.lang.Long.parseUnsignedLong(digest.take(15), 16)
      kind match {
        case "image" => ((h % 1920 + 1).toInt, (h / 1920 % 1080 + 1).toInt, 0L)
        case "audio" => (0, 0, h % 600000L)
        case "video" => ((h % 1280 + 1).toInt, (h / 1280 % 720 + 1).toInt, h % 3600000L)
        case _       => (0, 0, 0L)
      }
    }
    /** "Frame sampling": every `stride`-th byte offset, up to `max`. */
    def sampleFrames(nBytes: Long, max: Int = 8): Array[Long] = {
      if (nBytes <= 0) return Array.empty
      val stride = math.max(1L, nBytes / max)
      (0L until nBytes by stride).take(max).toArray
    }
  }

  /** Decode + feature-extract via typed mapPartitions (the real
    * distributed plumbing; the codec inside is the stub). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.empty[Byte])
        val digest = FakeCodec.digestOf(bytes) // hash once: digest column + decode seed
        val (w, h, d) = FakeCodec.decodeFromDigest(r.kind, digest)
        MediaFeatures(r.id, r.kind, bytes.length.toLong, digest,
          w, h, d, FakeCodec.sampleFrames(bytes.length.toLong))
      }
    }
  }

  /** DataFrame facade: (idCol: long, kindCol: string, payloadCol: binary)
    * → feature frame. Rows with a NULL id are dropped (media without an
    * addressable id can't be joined back); NULL kind decodes as
    * "unknown" (zero features). */
  def extractFeatures(df: DataFrame, idCol: String, kindCol: String,
      payloadCol: String): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    val typed = df
      .filter(col(idCol).isNotNull)
      .select(
        col(idCol).cast("long").as("id"),
        coalesce(col(kindCol).cast("string"), lit("unknown")).as("kind"),
        col(payloadCol).cast("binary").as("payload")).as[MediaRow]
    extractFeatures(typed).toDF()
  }

  case class ResizedMedia(
      id: Long, kind: String, payload: Array[Byte], width: Int, height: Int)

  /** "Resize" images/video stills to `targetW`×`targetH` — STUB codec
    * (see notice): the re-encoded payload is a deterministic
    * digest-seeded byte string whose length scales with the target
    * pixel count, so downstream size accounting and shuffle planning
    * behave like the real thing. The Spark shape is the part that
    * matters: per-row CPU in `mapPartitions`, binary in → binary out,
    * no shuffle, output schema carries the new dimensions. */
  def resize(
      media: Dataset[MediaRow],
      targetW: Int,
      targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.empty[Byte])
        // ~0.25 bytes/pixel "compressed"; seeded by the source digest so
        // resize is deterministic and content-addressed. Long math: an
        // Int pixel product overflows around 46k×46k and would silently
        // emit a 16-byte payload; cap at 256 MiB per row.
        val outLen = math.max(16L,
          math.min(targetW.toLong * targetH / 4, 256L * 1024 * 1024)).toInt
        val seed = FakeCodec.digestOf(bytes).take(16)
          .foldLeft(0L)((a, c) => a * 31 + c)
        val rng = new java.util.Random(seed)
        val out = new Array[Byte](outLen)
        rng.nextBytes(out)
        ResizedMedia(r.id, r.kind, out, targetW, targetH)
      }
    }
  }
}
