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
}
