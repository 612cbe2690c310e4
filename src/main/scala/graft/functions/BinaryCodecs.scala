package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] — the pluggable binary-payload decode surface, mirroring [[Serde]]
  * (the reference's reflectively-loaded body deserializer,
  * `/root/reference/.../serde/TextDeserializer.scala:44-68`) for *media*
  * payloads instead of text bodies: opaque `binary` column in, typed
  * feature struct out. The engine ships two implementations with identical
  * semantics:
  *
  *  - [[ByteProbeCodec]] — pure column expressions, fused into whole-stage
  *    codegen with the scan; the in-container stand-in for a real decoder
  *    (this container has no image/audio libraries).
  *  - [[BatchedByteProbeCodec]] — the same features computed imperatively
  *    over `mapPartitions` with explicit batching: the exact plumbing shape
  *    a real native codec (JNI image decode, ffmpeg frame extraction)
  *    drops into — batch the payloads, hand each batch to the library, emit
  *    feature rows. Swapping the stub probe for a real decode changes one
  *    function, not the pipeline.
  *
  * A spec proves the two produce identical output over the media table, so
  * the pluggability is tested, not aspirational.
  */
trait BinaryCodec extends Serializable {
  /** Schema of the feature struct this codec appends. */
  def featureSchema: StructType
  /** Append feature struct column `out` decoded from binary column
    * `payloadCol`. */
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame
}

object BinaryCodec {
  /** Shared feature schema of the two probe codecs: payload length + two
    * deterministic byte probes (what a real codec would replace with
    * width/height/duration/fingerprint...). */
  val ProbeSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("b0", LongType),
    StructField("b4", LongType)))

  /** Reflectively instantiate a codec from a config-supplied class name —
    * same contract and error surface as [[Serde.forName]] (objects,
    * `(StructType)` ctor — fed its own `ProbeSchema` stand-in — or no-arg). */
  def forName(className: String): BinaryCodec =
    Reflect.instantiate[BinaryCodec](className, ProbeSchema, classOf[BinaryCodec])
}

/** Deterministic fake "feature extraction" from the raw bytes as pure
  * column expressions — codegen'd and distributable even as a stub.
  * Byte probes go through a UTF-8 `cast(string)` + `ascii`, matching the
  * batched form for ASCII payloads (the fixture corpus). */
case object ByteProbeCodec extends BinaryCodec {
  val featureSchema: StructType = BinaryCodec.ProbeSchema
  def features(payload: Column): Column = struct(
    octet_length(payload).cast("long").as("n_bytes"),
    ascii(substring(payload.cast("string"), 1, 1)).cast("long").as("b0"),
    ascii(substring(payload.cast("string"), 5, 1)).cast("long").as("b4"))
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame =
    df.withColumn(out, features(col(payloadCol)))
}

/** The same probe features computed imperatively per partition, in explicit
  * batches — the adapter shape for codecs that cannot be column
  * expressions. `batchSize` bounds per-call memory exactly as a real
  * vectorized decode would (N images per native call, not the whole
  * partition). Cost note: this path serializes rows out of Tungsten, so
  * only use it when the decode genuinely needs a library call. */
final case class BatchedByteProbeCodec(batchSize: Int = 256) extends BinaryCodec {
  /** Config-driven form ([[BinaryCodec.forName]]): default batch size. */
  def this() = this(256)
  val featureSchema: StructType = BinaryCodec.ProbeSchema
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would hand `batch`'s payloads to the native library
        // here, one call for the whole batch
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          // null payload → struct of null fields, matching the column
          // form's semantics (octet_length/ascii of null are null, the
          // enclosing struct() is still non-null)
          val feat =
            if (bytes == null) Row(null, null, null)
            else {
              val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              def at(i: Int): Long = if (s.length > i) s.charAt(i).toLong else 0L
              Row(bytes.length.toLong, at(0), at(4))
            }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
