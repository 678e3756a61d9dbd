package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star §2b surface): image/audio/video
  * payloads modeled as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample as partition-batch transforms.
  *
  * The container ships no codec libraries, so the DECODE KERNELS ARE
  * DETERMINISTIC STUBS — clearly marked below — that parse a fake header
  * and histogram raw bytes. Everything AROUND the kernels is the real
  * 100 TB plumbing this module exists to pin down: explicit case-class
  * schemas, `mapPartitions` batch iteration (one JVM call per partition,
  * the Scala analog of arrow-batched `mapInPandas`; swap the kernel body
  * for a JNI/ffmpeg call and nothing else changes), narrow no-shuffle
  * execution, and feature vectors that compose directly with
  * [[Vectors]]' similarity operators.
  */
object Multimodal {

  /** An opaque media payload. `bytes` is never interpreted by Spark —
    * only by the partition-local kernels below. */
  case class Asset(asset_id: Long, modality: String, bytes: Array[Byte])

  case class AssetMeta(asset_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int)

  case class AssetFeatures(asset_id: Long, embedding: Seq[Double])

  case class AssetFrames(asset_id: Long, n_frames: Int, frames: Seq[Array[Byte]])

  /** Wrap a text column as binary assets (UTF-8), the test corpus's stand-in
    * for real media payloads: column-level cast, no kernel involved. */
  def assetsFromText(docs: DataFrame, textCol: String, idCol: String,
      modality: String = "text"): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).as("asset_id"), lit(modality).as("modality"),
      col(textCol).cast("binary").as("bytes")).as[Asset]
  }

  /** Ingest raw media FILES via Spark's `binaryFile` source — the step
    * real multimodal corpora start from (a bucket of .jpg/.wav/.mp4,
    * not a parquet column): distributed file listing + whole-file reads
    * as (path, modificationTime, length, content) rows, `pathGlobFilter`
    * narrowing server-side. The id is parsed from the file name
    * (`regexp_extract` — codegen'd, scan-stage); downstream is exactly
    * the [[Asset]] pipeline. Spark caps single files at
    * `spark.sql.sources.binaryFile.maxLength` (2 GiB) — chunk bigger
    * media upstream. Judged `q_binary_source` (bounded doc slice
    * round-tripped through real files; byte length oracled against
    * `octet_length`), plumbing pinned in MultimodalSpec. */
  def ingestBinaryDir(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String, idPattern: String = "(\\d+)"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // extract from the BASENAME, not the full path (ADVICE r11): a
        // digit run in any directory component (/tmp/run123/...) would
        // otherwise win over the file-name id under the default pattern
        regexp_extract(element_at(split(col("path"), "/"), -1),
          idPattern, 1).cast("long").as("asset_id"),
        col("length").as("n_bytes"), col("content"))

  /** STUB DECODER: reads a fake 2-byte "header" — width = 1 + (b0 mod 16),
    * height = 1 + (b1 mod 16); 0 where the payload is too short. A real
    * image decode (libjpeg etc.) replaces ONLY the body of `decodeOne`;
    * the mapPartitions batch shape, schema, and null/short-payload
    * contract stay. */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    def decodeOne(a: Asset): AssetMeta = {
      val b = a.bytes
      val w = if (b.length >= 1) 1 + ((b(0) & 0xFF) % 16) else 0
      val h = if (b.length >= 2) 1 + ((b(1) & 0xFF) % 16) else 0
      AssetMeta(a.asset_id, a.modality, b.length, w, h)
    }
    assets.mapPartitions(_.map(decodeOne))
  }

  /** STUB FEATURE EXTRACTOR: L2-normalized 16-bin byte-value histogram —
    * a stand-in for a vision/audio embedding model. Partition-batch
    * iteration (amortize model load per PARTITION, not per row, exactly
    * where a real model's session would be opened); output composes with
    * [[Vectors.bruteForceTopK]] / [[Vectors.cosineNearDup]]. */
  def extractFeatures(assets: Dataset[Asset], bins: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // a real extractor would initialize its model HERE, once per partition
      it.map { a =>
        val hist = new Array[Double](bins)
        a.bytes.foreach(b => hist((b & 0xFF) * bins / 256) += 1.0)
        val norm = math.sqrt(hist.map(x => x * x).sum)
        AssetFeatures(a.asset_id,
          (if (norm == 0) hist else hist.map(_ / norm)).toSeq)
      }
    }
  }

  /** STUB FRAME SAMPLER: slices the payload into up to `n` equal chunks —
    * the shape of video frame extraction (one row in, array of decoded
    * frames out; exploding downstream keeps per-frame rows narrow). */
  def frameSample(assets: Dataset[Asset], n: Int): Dataset[AssetFrames] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val len = a.bytes.length
      val frames =
        if (len == 0) Seq.empty[Array[Byte]]
        else {
          val size = math.max(1, math.ceil(len.toDouble / n).toInt)
          a.bytes.grouped(size).toSeq
        }
      AssetFrames(a.asset_id, frames.length, frames)
    })
  }
}
