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

/** One sampled frame from a media payload (m3 output row). */
case class FrameOut(doc_id: Long, frame_idx: Int, frame_md5: String)

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
    * clearly-marked deterministic stub (md5-derived dimensions — which
    * also makes it SQL-replayable, so the DuckDB oracle gates it); the
    * iterator shape is exactly what a JNI/FFI decoder integration needs:
    * one expensive init per partition (here the MessageDigest instance,
    * standing in for decoder/codec state), streamed rows, typed output. */
  val decodeStub: Q = Q(
    "m2_decode_stub",
    """WITH h AS (SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, byte_len,
      |  CAST(h % 1920 + 1 AS INT) AS width,
      |  CAST((h // 1920) % 1080 + 1 AS INT) AS height,
      |  CAST(h % 30 + 1 AS INT) AS n_frames,
      |  CASE WHEN h % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sp = s
    import sp.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init happens once per partition (a real integration
        // would open the codec/JNI context here)
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          // STUB: a real implementation decodes `bytes` with an image
          // library; dimensions here are deterministic functions of the
          // payload (first 60 bits of its md5) so the pipeline is
          // testable end-to-end AND replayable by the SQL oracle.
          digest.reset()
          val hex = digest.digest(bytes).map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
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

  /** Frame sampling: the one-to-many decode shape (a video payload
    * explodes into its sampled frames). Every 7th frame of the stub
    * decoder's frame count is emitted with a per-frame content hash —
    * all md5-derived, so the row explosion is SQL-replayable. The
    * partition iterator flatMaps (one input row → n output rows)
    * with decoder state initialized once per partition, which is the
    * exact shape a real ffmpeg/JNI frame extractor needs; output rows
    * stream without buffering the whole partition. */
  val frameSample: Q = Q(
    "m3_frame_sample",
    """WITH h AS (SELECT doc_id, md5(text) AS ph,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |  FROM documents)
      |SELECT doc_id, CAST(i AS INT) AS frame_idx,
      |  md5(ph || ':' || CAST(i AS VARCHAR)) AS frame_md5
      |FROM h, generate_series(0, 29) t(i)
      |WHERE i % 7 = 0 AND i < h % 30 + 1
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    val sp = s
    import sp.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        it.flatMap { case (id, bytes) =>
          // STUB decode: frame count from the payload hash (as m2); a
          // real extractor would pull every 7th frame from the codec
          digest.reset()
          val ph = hex(digest.digest(bytes))
          val h = java.lang.Long.parseLong(ph.substring(0, 15), 16)
          val nFrames = (h % 30).toInt + 1
          (0 until nFrames by 7).iterator.map { i =>
            digest.reset()
            val fh = hex(digest.digest(s"$ph:$i".getBytes("UTF-8")))
            FrameOut(id, i, fh)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: the dimension-transform step of an image pipeline. The
    * stub decoder's (width, height) are scaled to fit the longest side
    * into 256 px with exact integer arithmetic (floor division,
    * minimum 1 px — aspect-preserving), and the "resized payload" is
    * represented by a re-keyed content hash, which is what a cache/
    * dedup layer downstream of a real resizer keys on. All integer ops
    * → bit-identical in the DuckDB replay. */
  val resizeStub: Q = Q(
    "m4_resize_stub",
    """WITH h AS (SELECT doc_id, md5(text) AS ph,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
      |  FROM documents),
      |dims AS (SELECT doc_id, ph,
      |    CAST(h % 1920 + 1 AS BIGINT) AS w,
      |    CAST((h // 1920) % 1080 + 1 AS BIGINT) AS ht
      |  FROM h),
      |m AS (SELECT doc_id, ph, w, ht, GREATEST(w, ht) AS mx FROM dims)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
      |  CAST(CASE WHEN mx <= 256 THEN w ELSE GREATEST(1, (w * 256) // mx) END AS INT) AS out_width,
      |  CAST(CASE WHEN mx <= 256 THEN ht ELSE GREATEST(1, (ht * 256) // mx) END AS INT) AS out_height,
      |  md5(ph || ':' ||
      |    CAST(CASE WHEN mx <= 256 THEN w ELSE GREATEST(1, (w * 256) // mx) END AS VARCHAR) || 'x' ||
      |    CAST(CASE WHEN mx <= 256 THEN ht ELSE GREATEST(1, (ht * 256) // mx) END AS VARCHAR)) AS resized_md5
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sp = s
    import sp.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        it.map { case (id, bytes) =>
          // STUB: a real resizer rescales decoded pixels; the integer
          // fit-to-256 dimension math and the re-keyed hash are real
          digest.reset()
          val ph = hex(digest.digest(bytes))
          val h = java.lang.Long.parseLong(ph.substring(0, 15), 16)
          val w = h % 1920 + 1
          val ht = (h / 1920) % 1080 + 1
          val mx = math.max(w, ht)
          val (ow, oh) =
            if (mx <= 256) (w, ht)
            else (math.max(1L, w * 256 / mx), math.max(1L, ht * 256 / mx))
          digest.reset()
          val rm = hex(digest.digest(s"$ph:${ow}x$oh".getBytes("UTF-8")))
          (id, w.toInt, ht.toInt, ow.toInt, oh.toInt, rm)
        }
      }
      .toDF("doc_id", "width", "height", "out_width", "out_height", "resized_md5")
      .orderBy("doc_id")
  }

  /** Feature extraction: the embedding step of an image pipeline — one
    * fixed-width vector per payload, emitted as 8 integer feature
    * columns (a real extractor returns floats from a vision model; the
    * stub derives each lane from the payload hash so the whole vector
    * is SQL-replayable and exactly comparable). The mapPartitions
    * shape (model loaded once per partition, rows streamed through)
    * is precisely the batched-inference integration point. */
  val featureStub: Q = Q(
    "m5_feature_extract_stub",
    """WITH h AS (SELECT doc_id, md5(text) AS ph FROM documents)
      |SELECT doc_id,
      |  ('0x' || substr(md5(ph || ':f0'), 1, 15))::BIGINT AS f0,
      |  ('0x' || substr(md5(ph || ':f1'), 1, 15))::BIGINT AS f1,
      |  ('0x' || substr(md5(ph || ':f2'), 1, 15))::BIGINT AS f2,
      |  ('0x' || substr(md5(ph || ':f3'), 1, 15))::BIGINT AS f3,
      |  ('0x' || substr(md5(ph || ':f4'), 1, 15))::BIGINT AS f4,
      |  ('0x' || substr(md5(ph || ':f5'), 1, 15))::BIGINT AS f5,
      |  ('0x' || substr(md5(ph || ':f6'), 1, 15))::BIGINT AS f6,
      |  ('0x' || substr(md5(ph || ':f7'), 1, 15))::BIGINT AS f7
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sp = s
    import sp.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model/codec init once per partition (the batched-inference
        // integration point of a real extractor)
        val digest = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        def lane(ph: String, i: Int): Long = {
          digest.reset()
          java.lang.Long.parseLong(
            hex(digest.digest(s"$ph:f$i".getBytes("UTF-8"))).substring(0, 15), 16)
        }
        it.map { case (id, bytes) =>
          digest.reset()
          val ph = hex(digest.digest(bytes))
          (id, lane(ph, 0), lane(ph, 1), lane(ph, 2), lane(ph, 3),
            lane(ph, 4), lane(ph, 5), lane(ph, 6), lane(ph, 7))
        }
      }
      .toDF("doc_id", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(binaryMeta, decodeStub, frameSample, resizeStub, featureStub)
}
