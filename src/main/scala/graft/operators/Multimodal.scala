package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: opaque `binary` payloads with typed metadata structs,
  * plus decode / feature-extraction / frame-sampling stages.
  *
  * The image/audio codec libraries are NOT in this container, so `decode` is
  * a STUB — a clearly-marked deterministic fake (byte statistics instead of
  * pixel decoding). Everything around it is real and is the part that
  * matters at 100 TB: the binary+struct schema round-trips parquet, the
  * pipeline is a per-partition batch map (the same shape a Pandas-UDF/JNI
  * decoder plugs into), and partitioning/pruning behave like any other
  * column. Swapping the fake for a real codec changes ONLY the body of
  * [[MultimodalStub.decodeBytes]].
  */
object Multimodal {

  /** Decoded feature record (what a real image decoder would emit). */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      mean_byte: Double,
      max_byte: Int,
      entropy_proxy: Double)

  /** Build a media catalog from the documents fixture: content = the text's
    * bytes (stand-in payload), metadata derived via the portable 60-bit hash
    * so any engine can reproduce it.
    *
    * `blob` is a deterministic NON-ASCII payload (a 4-link md5 chain,
    * unhexed to 64 raw bytes spanning the full 0–255 range): the text-cast
    * `content` column is pure ASCII, so it alone never proves that arbitrary
    * bytes survive the parquet round trip — `blob` does, and any engine with
    * md5 + unhex reproduces it bit-for-bit (mm_blob_roundtrip oracle).
    */
  def catalog(docs: DataFrame): DataFrame =
    docs
      .withColumn("__h", Hashing.md5Hash60(col("text")))
      .select(
        col("doc_id"),
        col("text").cast("binary").as("content"),
        unhex(concat(
          md5(col("text")),
          md5(concat(col("text"), lit("a"))),
          md5(concat(col("text"), lit("b"))),
          md5(concat(col("text"), lit("c"))))).as("blob"),
        struct(
          element_at(array(lit("png"), lit("jpeg"), lit("webp")),
            (col("__h") % 3 + 1).cast("int")).as("format"),
          (lit(32) + col("__h") % 448).cast("int").as("width"),
          // integer division (`div`), not `/` — Column./ is double division
          (lit(32) + expr("(__h div 448) % 448")).cast("int").as("height"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: per-partition batch map over the binary payload.
    * Deterministic fake features (byte stats) replace real pixel decoding —
    * see the object Scaladoc. mapPartitions is deliberate: a real decoder
    * amortizes codec init per batch exactly here.
    */
  def decodeFeatures(spark: SparkSession, cat: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    cat.select(
        col("doc_id"), col("content"),
        col("meta.format"), col("meta.width"), col("meta.height"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Int, Int, Long)]
      .mapPartitions { it =>
        // real pipeline: codecLib.init() once per partition here
        it.map { case (id, bytes, fmt, w, hgt, n) =>
          MediaFeatures(id, fmt, w, hgt, n,
            mean_byte = MultimodalStub.meanByte(bytes),
            max_byte = MultimodalStub.maxByte(bytes),
            entropy_proxy = MultimodalStub.entropyProxy(bytes))
        }
      }
  }

  /** Resized media record (what a real resampler would emit). */
  case class ResizedMedia(
      doc_id: Long,
      new_width: Int,
      new_height: Int,
      n_bytes_out: Long,
      out_md5: String)

  /** STUB resize: same batch-map shape as [[decodeFeatures]] — a real
    * resampler (libvips/ffmpeg via JNI, or a Pandas UDF on a Python
    * cluster) replaces only [[MultimodalStub.downsample]]. The fake is a
    * deterministic stride-`factor` byte downsample with metadata halved
    * accordingly, so the full path — binary in, binary transform, new
    * payload + updated metadata out — is oracle-checkable bit-for-bit.
    */
  def resizeStub(
      spark: SparkSession, cat: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    cat.select(col("doc_id"), col("content"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // real pipeline: resampler init once per partition here
        it.map { case (id, bytes, w, hgt) =>
          val out = MultimodalStub.downsample(bytes, factor)
          ResizedMedia(id, w / factor, hgt / factor,
            out.length.toLong, MultimodalStub.md5Hex(out))
        }
      }
  }

  /** Frame sampling: split the payload into fixed-size frames (the video
    * analog: every Nth frame), one output row per frame. Pure columnar —
    * posexplode over binary slices, no UDF.
    */
  def frameSample(cat: DataFrame, frameBytes: Int): DataFrame =
    cat.select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(
                sequence(0, CAST(ceil(meta.n_bytes / ${frameBytes}.0) AS INT) - 1),
                i -> substring(content, i * $frameBytes + 1, $frameBytes))""")))
      .select(
        col("doc_id"), col("pos").as("frame_id"),
        col("col").as("frame"),
        octet_length(col("col")).as("frame_bytes"),
        md5(col("col")).as("frame_md5"))
}

/** The stub body — the ONLY code a real codec integration replaces. */
object MultimodalStub {

  def meanByte(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
      s.toDouble / bytes.length
    }

  def maxByte(bytes: Array[Byte]): Int = {
    var m = 0; var i = 0
    while (i < bytes.length) { val v = bytes(i) & 0xFF; if (v > m) m = v; i += 1 }
    m
  }

  /** Stride-`factor` byte downsample — the fake "resize". */
  def downsample(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  // per-thread digest, reset per call — a getInstance() in the batch-map
  // hot loop would pay a JCA provider lookup per ROW (same discipline as
  // graft.functions.Md5Pair)
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Hex(bytes: Array[Byte]): String = {
    val d = md5Digest.get()
    d.reset()
    d.digest(bytes).map(b => f"${b & 0xFF}%02x").mkString
  }

  /** Distinct-byte-count / 256 — a fake "entropy" stand-in for decoded
    * content statistics.
    */
  def entropyProxy(bytes: Array[Byte]): Double = {
    val seen = new Array[Boolean](256)
    var n = 0; var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      if (!seen(v)) { seen(v) = true; n += 1 }
      i += 1
    }
    n / 256.0
  }
}
