package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns — image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed in partition batches. The
  * production decode (JPEG/PNG/audio codecs) needs native libraries not
  * present in this environment, so the decoder is PLUGGABLE: the
  * Spark-side plumbing — schema, encoder, batch shape, partitioning —
  * is real and tested with a deterministic byte-level "decoder"; the
  * codec-backed implementation drops in as another
  * `Array[Byte] => Features` function (the JVM-side equivalent of the
  * mapInPandas batch UDF a PySpark pipeline would use).
  */
object Media {

  /** A media record: id + opaque payload + typed metadata (the schema a
    * 100 TB media lake table would carry; payloads partition by id,
    * metadata prunes without touching bytes).
    */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Extracted features — the decode/feature-extract output schema. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      head: String)

  type Decoder = MediaRecord => MediaFeatures

  /** Deterministic byte-level stand-in for the codec decode: size,
    * md5 checksum, first-16-bytes preview. Both engines can reproduce
    * it, which is what makes the plumbing oracle-checkable.
    */
  val byteStatsDecoder: Decoder = r => MediaFeatures(
    r.media_id, r.media_type,
    n_bytes = r.payload.length.toLong,
    checksum = java.security.MessageDigest.getInstance("MD5")
      .digest(r.payload).map("%02x".format(_)).mkString,
    head = new String(r.payload.take(16), "UTF-8"))

  /** The real decoder slot: wire a codec (JVM image/audio lib) here.
    * Kept unimplemented on purpose — this environment ships none.
    */
  val codecDecoder: Decoder = _ =>
    throw new NotImplementedError(
      "codec decode requires native image/audio libraries; " +
        "plug a JVM decoder into Media.process instead")

  /** Batch feature extraction over partitions: each partition's records
    * stream through the decoder without collecting to the driver — the
    * Scala twin of a mapInPandas batch UDF (same batch shape: iterator
    * in, iterator out, one call per partition).
    */
  def process(records: Dataset[MediaRecord],
      decoder: Decoder = byteStatsDecoder): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions(_.map(decoder))
  }

  /** Container-header metadata for an image payload. */
  final case class MediaMeta(media_id: Long, format: String, width: Int, height: Int)

  /** Dependency-free image-header probe: PNG (IHDR), JPEG (SOF marker
    * scan), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER).
    * Reading dimensions needs only the container header, no codec — so
    * unlike the pixel decode this part of the multimodal story is REAL
    * in this environment. At scale this runs as a partition-batch map
    * over the binary column, prunes by metadata before any expensive
    * decode, and never touches more than the first KB of each payload.
    */
  def imageMeta(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length >= 24 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some(("png", be32(p, 16), be32(p, 20)))
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')
      Some(("gif", le16(p, 6), le16(p, 8)))
    else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
      // biHeight is SIGNED: negative means a valid top-down BMP (common
      // from Windows capture tools) — normalize so downstream area math
      // and height>0 filters don't quarantine valid images (r10 review)
      Some(("bmp", le32(p, 18), math.abs(le32(p, 22))))
    else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      jpegSof(p)
    else None
  }

  /** Walk JPEG markers to the first SOF frame header (dimensions live
    * there, not at a fixed offset).
    */
  private def jpegSof(p: Array[Byte]): Option[(String, Int, Int)] = {
    var i = 2
    while (i + 9 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      // ISO/IEC 10918-1 permits any number of 0xFF FILL bytes before a
      // marker id; without skipping them, the length field was read from
      // the real marker byte and the walk derailed into garbage,
      // "unknown"-quarantining valid JPEGs (r10 review)
      while (i + 9 < p.length && (p(i + 1) & 0xff) == 0xff) i += 1
      val m = p(i + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone markers
      else {
        val len = be16(p, i + 2)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", be16(p, i + 7), be16(p, i + 5)))
        i += 2 + len
      }
    }
    None
  }

  /** Audio container metadata: (format, sampleRate, channels). WAV/RIFF
    * fmt chunk — same dependency-free header-probe idea as [[imageMeta]].
    */
  def audioMeta(p: Array[Byte]): Option[(String, Int, Int)] = {
    if (p.length < 36 || !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    // walk chunks from offset 12 to the "fmt " chunk
    var i = 12
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = le32(p, i + 4)
      if (id == "fmt " && i + 16 <= p.length)
        return Some(("wav", le32(p, i + 12), le16(p, i + 10)))
      if (len < 0) return None
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Partition-batch header probe over a media table — unparseable
    * payloads surface as format "unknown" (curation pipelines route them
    * to quarantine rather than dropping silently).
    */
  def probeHeaders(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions(_.map { r =>
      imageMeta(r.payload) match {
        case Some((fmt, w, h)) => MediaMeta(r.media_id, fmt, w, h)
        case None => MediaMeta(r.media_id, "unknown", -1, -1)
      }
    })
  }

  /** Wrap a text table as a media table (payload = utf8 bytes) — the
    * shape testdata lacks a true binary column for; real lakes read
    * parquet BINARY directly.
    */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Frame/segment sampling on the raw payload (`binary` slicing): every
    * `stride` bytes take a `width`-byte sample — the byte-level shape of
    * video frame-sampling (real decode swaps in via [[process]]).
    */
  def sampleSegments(media: DataFrame, width: Int, stride: Int, maxSamples: Int): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("offset", explode(sequence(lit(1), least(
        greatest((col("n_bytes") / stride).cast("int"), lit(1)), lit(maxSamples)))))
      .select(
        col("media_id"),
        col("offset"),
        col("payload").substr((col("offset") - 1) * stride + 1, lit(width)).as("segment"))

  /** Nearest-neighbor resize of a row-major byte matrix — the resize
    * stage of an image pipeline with the pixel semantics expressed on
    * the raw grid (a real decoder in [[codecDecoder]]'s slot hands this
    * exactly such a W×H byte plane per channel). For each destination
    * pixel (dy, dx) the source byte at (⌊dy·srcH/dstH⌋, ⌊dx·srcW/dstW⌋)
    * is taken; the output is the reassembled dstW×dstH binary. Pure
    * codegen'd byte slicing (`substr`/`concat` on BINARY) — no UDF, no
    * per-row driver work; payloads shorter than srcW×srcH are the
    * caller's filter (partial frames have no defined resize).
    */
  def resizeNearest(media: DataFrame, srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    require(srcW > 0 && srcH > 0 && dstW > 0 && dstH > 0, "dimensions must be positive")
    // one substr expression per destination pixel: bounded so the plan
    // stays codegen-compilable (a 64x64 target would be 4096 exprs and
    // blow the JVM's 64KB method limit); larger targets belong in the
    // per-partition codec slot where resize runs as plain byte code
    require(dstW * dstH <= 256,
      s"resizeNearest builds one expression per destination pixel; " +
        s"$dstW x $dstH exceeds the 256-pixel expression budget — use the codec slot")
    val samples = for { dy <- 0 until dstH; dx <- 0 until dstW } yield {
      val sy = dy * srcH / dstH
      val sx = dx * srcW / dstW
      col("payload").substr(lit(sy * srcW + sx + 1), lit(1))
    }
    media.select(col("media_id"), concat(samples: _*).as("resized"))
  }
}
