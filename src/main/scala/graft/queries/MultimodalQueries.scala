package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t

/** Decoded media metadata row — the schema a real image/audio decoder
  * would emit. Deterministic STUB values stand in for the decode step
  * (no media libs in this environment); the Spark-side plumbing
  * (binary column, partition iteration, typed schema) is real. */
case class MediaMeta(
    doc_id: Long,
    byte_len: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    format: String)

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata. The pattern at 100 TB: payloads stay columnar in parquet,
  * decode/feature-extract runs as a batched per-partition pass
  * (`mapPartitions`, the Scala analog of `mapInPandas`) so decoder
  * state is amortized across a partition, never per-row. */
object MultimodalQueries {

  /** Binary plumbing that IS oracle-checkable: payload byte length and
    * content hash computed on the binary column. */
  val binaryMeta: Q = Q(
    "m1_binary_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).as("byte_len"),
        md5(encode(col("text"), "UTF-8")).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** Batched fake-decode over binary payloads. The decode itself is a
    * clearly-marked deterministic stub (hash-derived dimensions); the
    * iterator shape is exactly what a JNI/FFI decoder integration needs:
    * one expensive init per partition, streamed rows, typed output. */
  val decodeStub: Q = Q.noOracle("m2_decode_stub") { (s, dir) =>
    val sp = s
    import sp.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // [decoder init would happen here, once per partition]
        it.map { case (id, bytes) =>
          // STUB: a real implementation decodes `bytes` with an image
          // library; dimensions here are deterministic functions of the
          // payload so the pipeline is testable end-to-end.
          val h = java.util.Arrays.hashCode(bytes).toLong & 0x7fffffffL
          MediaMeta(
            doc_id = id,
            byte_len = bytes.length,
            width = (h % 1920).toInt + 1,
            height = ((h / 1920) % 1080).toInt + 1,
            n_frames = (h % 30).toInt + 1,
            format = if (h % 2 == 0) "png" else "jpeg")
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(binaryMeta, decodeStub)
}
