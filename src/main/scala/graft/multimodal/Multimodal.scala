package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed (struct) metadata, and keep every
  * stage a narrow, codegen'd projection — the 100 TB shape is "payload
  * bytes never leave the executor; only small derived features
  * shuffle".
  *
  * Decode is REAL for byte-level formats that need no native library:
  * [[Decoders.PpmDecoder]] (binary PPM images) and
  * [[Decoders.WavDecoder]] (RIFF/WAVE PCM-16 audio) parse actual
  * payloads through the same per-partition batch shape. The STUB
  * ([[fakeDecodeFeatures]]/[[StubDecoder]]) remains only for formats
  * that genuinely require native codecs (JPEG/H.264/...), which this
  * container does not ship: a deterministic stand-in with the real
  * schema, batch shape, and partitioning behavior — swapping in a
  * real codec changes only that one class, exactly as the PPM/WAV
  * decoders demonstrate.
  */
object Multimodal {

  /** Opaque payload bytes (here: the UTF-8 bytes of a text column —
    * the testdata has no true binary column, but BinaryType plumbing is
    * identical for any byte payload). */
  def payload(data: Column): Column = data.cast("binary")

  /** Payload size in bytes (not characters). */
  def byteLength(bin: Column): Column = length(bin).cast("long")

  /** Content checksum of the raw bytes (md5 hex). */
  def checksum(bin: Column): Column = md5(bin)

  /** Base64 of the first n payload bytes — the "thumbnail" access
    * pattern: fixed-size prefix reads without materializing the whole
    * payload downstream. */
  def headBase64(bin: Column, n: Int): Column = base64(substring(bin, 1, n))

  /** Typed metadata struct — schema travels with the payload. */
  def meta(fields: (String, Column)*): Column =
    struct(fields.map { case (n, c) => c.as(n) }: _*)

  /** Every `stride`-th character of a text payload — the frame-sample
    * access pattern (sample k-th frame of a video) expressed on the
    * testdata's text payloads. One indexed pass over the char array
    * (an index-generating lambda capturing the array would re-evaluate
    * the split per element); payloads shorter than one stride yield
    * the empty string. */
  def frameSample(text: Column, stride: Int): Column =
    // NULL payload samples as the empty payload (the NULL-is-empty
    // convention, COMPAT §4): Spark's array_join otherwise yields ''
    // while the oracle's array_to_string yields NULL (found by
    // tools/fuzz_correctness.py)
    array_join(
      filter(
        transform(split(coalesce(text, lit("")), ""),
          (c, i) => when((i + 1) % stride === 0, c)),
        c => c.isNotNull), "")

  /** STUB decoder: deterministic fake feature vector derived from the
    * payload checksum — stands in for "decode image + extract features"
    * (no codecs in this container). dims 32-bit values from repeated
    * md5, exact in any engine; replace with a real decoder expression
    * or Arrow-batched UDF in production. */
  def fakeDecodeFeatures(bin: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => conv(substring(md5(concat(md5(bin), i.cast("string"))), 1, 8), 16, 10).cast("long"))

  /** Decoded-payload row shape: parsed metadata + extracted features. */
  final case class Decoded(doc_id: Long, width: Long, height: Long, features: Seq[Long])

  /** Batch-decode plumbing — the Scala analog of `mapInPandas`: ONE
    * decoder instance per PARTITION (real codecs amortize native-lib
    * init exactly here), payload rows streamed through it as an
    * iterator, output schema declared by the [[Decoded]] encoder.
    * The decoder itself is the documented STUB ([[StubDecoder]] —
    * feature math identical to [[fakeDecodeFeatures]], asserted in
    * MultimodalSpec); swapping in a real image/audio codec changes
    * only that class. Narrow (no shuffle): payload bytes never leave
    * the executor, only the small decoded rows flow on.
    */
  def decodeFeaturesBatched(df: DataFrame, dims: Int,
      idCol: String = "doc_id", binCol: String = "payload"): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val dec = new StubDecoder(dims) // per-partition init
        // NULL payload decodes as the zero-byte payload — the library's
        // NULL-text-is-empty convention (COMPAT §4), mirrored in the
        // oracle's coalesce (found by tools/fuzz_correctness.py)
        rows.map { case (id, bytes) =>
          dec.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** The stand-in for a real media decoder: "parses" metadata from the
    * byte length and "extracts" the same md5-chain features as
    * [[fakeDecodeFeatures]] (lowercase-hex conventions match Spark's
    * and DuckDB's md5), so both decode paths and the SQL oracle agree
    * bit-for-bit. Deliberately stateful-per-instance (the MessageDigest)
    * like a real codec handle.
    *
    * Round 8: with [[Decoders.ImageIoDecoder]] (JDK javax.imageio —
    * real PNG/JPEG/GIF/BMP decode, no native lib) joining the PPM and
    * WAV parsers, the stub's remaining territory is VIDEO only (the
    * JDK ships no H.264/VP9 codec; that genuinely needs native libs
    * absent from this environment). Round 10 narrows it further:
    * [[Decoders.VideoProbe]] parses MP4/AVI CONTAINER metadata
    * (duration, tracks, codec fourcc, dimensions) pure-JVM, so only
    * frame-pixel DECODE remains stubbed. */
  final class StubDecoder(dims: Int) {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def decode(id: Long, bytes: Array[Byte]): Decoded = {
      md.reset()
      val h = java.util.HexFormat.of().formatHex(md.digest(bytes))
      val feats = (0 until dims).map { i =>
        md.reset()
        val d = md.digest((h + i.toString).getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      Decoded(id, bytes.length.toLong % 1024L, (bytes.length.toLong * 7L) % 768L, feats)
    }
  }
}
