package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star per BASELINE.json): media is an
  * opaque `binary` payload column with typed metadata, processed by
  * imperative per-partition batch operators — the Scala analog of
  * `mapInPandas` (typed `Dataset[T]`, `mapPartitions`, explicit batch
  * granularity so a real decoder would amortize model/codec setup per
  * batch, not per row).
  *
  * The actual image/audio decode is STUBBED (no codec libs in this
  * environment): `FakeCodec` derives deterministic byte-level results, so
  * the full distributed pipeline — binary schema, partitioning, batch
  * shape, metadata struct — is real and oracle-verified end-to-end, and a
  * production decoder drops into `FakeCodec`'s slot unchanged.
  *
  * Scale notes (100 TB of media): payloads never shuffle — every operator
  * here is a narrow map over the scan; only the (small) extracted
  * features/metadata ever reach an exchange. Batch size bounds peak
  * memory per task regardless of file count.
  */
object Multimodal {

  /** One media object: payload + typed metadata (the reference's data
    * model has no media type — this is the north-star extension; binary
    * is one of its 15 indexable types, index.rs:396-415). */
  final case class Media(media_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  final case class Decoded(media_id: Long, width: Int, height: Int, n_bytes: Long)
  final case class Resized(media_id: Long, w: Int, h: Int, rw: Int, rh: Int)
  final case class Features(media_id: Long, f_vowel: Long, f_space: Long, f_alpha: Long, f_other: Long)
  final case class Frame(media_id: Long, frame_no: Int, frame_md5: String)
  final case class PackCost(media_id: Long, cost: Long)

  /** Deterministic stand-in for a real codec. A production build replaces
    * these bodies with actual decode calls; signatures and batch shape
    * stay identical. */
  object FakeCodec {
    /** "Decode image header": dimensions derived from leading bytes. */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xFF else 0
      val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
      (1 + b0 % 640, 1 + b1 % 480)
    }

    /** "Feature extraction": byte-class histogram (vowel/space/alpha/other). */
    def features(payload: Array[Byte]): (Long, Long, Long, Long) = {
      var v = 0L; var sp = 0L; var al = 0L; var ot = 0L
      payload.foreach { b =>
        val c = (b & 0xFF).toChar
        if ("aeiou".indexOf(c) >= 0) v += 1
        else if (c == ' ') sp += 1
        else if (c >= 'a' && c <= 'z') al += 1
        else ot += 1
      }
      (v, sp, al, ot)
    }

    /** "Resize": aspect-preserving fit into a square box, integer math
      * (a real implementation would also transform pixels; the dimension
      * contract is what downstream schemas depend on). */
    def resizeFit(w: Int, h: Int, box: Int): (Int, Int) =
      if (w >= h) (box, h * box / w) else (w * box / h, box)

    /** "Frame sampling": every `stride`-th 16-byte chunk, fingerprinted. */
    def sampleFrames(payload: Array[Byte], stride: Int): Seq[(Int, String)] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until payload.length / 16 by stride).map { f =>
        md.reset()
        val hex = md.digest(java.util.Arrays.copyOfRange(payload, f * 16, f * 16 + 16))
          .map(b => f"$b%02x").mkString
        (f, hex)
      }
    }
  }

  val BatchSize = 64

  /** Media table: document text bytes standing in for image payloads. */
  def media(s: SparkSession, dir: String): Dataset[Media] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("image/fake").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** Batched per-partition map: the `mapInPandas` shape — a real decoder
    * would init its codec once per partition and process `BatchSize` rows
    * per call. */
  private def inBatches[T, U](it: Iterator[T], f: Seq[T] => Seq[U]): Iterator[U] =
    it.grouped(BatchSize).flatMap(batch => f(batch))

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "mm1_decode",
      (s, dir) => {
        import s.implicits._
        media(s, dir).mapPartitions { it =>
          inBatches[Media, Decoded](it, batch => batch.map { m =>
            val (w, h) = FakeCodec.decodeDims(m.payload)
            Decoded(m.media_id, w, h, m.n_bytes)
          })
        }.toDF()
      },
      // text is ASCII here, so byte 0/1 == ascii of chars 1/2
      Some("""SELECT doc_id AS media_id,
             |  1 + ascii(substr(text, 1, 1)) % 640 AS width,
             |  1 + ascii(substr(text, 2, 1)) % 480 AS height,
             |  strlen(text) AS n_bytes
             |FROM documents""".stripMargin)),

    QueryDef(
      "mm2_features",
      (s, dir) => {
        import s.implicits._
        media(s, dir).mapPartitions { it =>
          inBatches[Media, Features](it, batch => batch.map { m =>
            val (v, sp, al, ot) = FakeCodec.features(m.payload)
            Features(m.media_id, v, sp, al, ot)
          })
        }.toDF()
      },
      Some("""SELECT doc_id AS media_id,
             |  length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS f_vowel,
             |  length(text) - length(regexp_replace(text, ' ', '', 'g')) AS f_space,
             |  length(regexp_replace(text, '[^a-z]', '', 'g'))
             |    - (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) AS f_alpha,
             |  length(regexp_replace(text, '[a-z ]', '', 'g')) AS f_other
             |FROM documents""".stripMargin)),

    QueryDef(
      "mm2b_resize",
      (s, dir) => {
        import s.implicits._
        media(s, dir).mapPartitions { it =>
          inBatches[Media, Resized](it, batch => batch.map { m =>
            val (w, h) = FakeCodec.decodeDims(m.payload)
            val (rw, rh) = FakeCodec.resizeFit(w, h, 256)
            Resized(m.media_id, w, h, rw, rh)
          })
        }.toDF()
      },
      // aspect-preserving fit into 256x256 in pure integer math
      Some("""WITH d AS (SELECT doc_id AS media_id,
             |    1 + ascii(substr(text, 1, 1)) % 640 AS w,
             |    1 + ascii(substr(text, 2, 1)) % 480 AS h
             |  FROM documents)
             |SELECT media_id, w, h,
             |  CASE WHEN w >= h THEN 256 ELSE (w * 256) // h END AS rw,
             |  CASE WHEN w >= h THEN (h * 256) // w ELSE 256 END AS rh
             |FROM d""".stripMargin)),

    QueryDef(
      "mm3_framesample",
      (s, dir) => {
        import s.implicits._
        media(s, dir).mapPartitions { it =>
          inBatches[Media, Frame](it, batch => batch.flatMap { m =>
            FakeCodec.sampleFrames(m.payload, stride = 4).map {
              case (f, hex) => Frame(m.media_id, f, hex)
            }
          })
        }.toDF()
      },
      Some("""SELECT doc_id AS media_id, CAST(4 * f AS INT) AS frame_no,
             |  md5(substr(text, 1 + 4 * f * 16, 16)) AS frame_md5
             |FROM documents,
             |  UNNEST(range((strlen(text) // 16 + 3) // 4)) t(f)""".stripMargin)),

    // ----- multimodal sequence packing --------------------------------------
    // The vision-language training-sample packer: each sample's sequence
    // cost is text tokens PLUS image patches (ceil(w/16)·ceil(h/16) from
    // the decoded dims — the ViT patch-grid arithmetic), and samples pack
    // into fixed-budget sequences exactly like tx7 (256 md5 shards, one
    // shuffle, O(1) window state). The decode runs in the same batched
    // mapPartitions shape as mm1 (a real codec drops in unchanged);
    // only (id, cost) scalars leave the map — payloads never shuffle.
    QueryDef(
      "mm4_pack_multimodal",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val budget = 2048L
        val costs = media(s, dir).mapPartitions { it =>
          inBatches[Media, PackCost](it, batch => batch.map { m =>
            val (w, h) = FakeCodec.decodeDims(m.payload)
            val patches = ((w + 15) / 16).toLong * ((h + 15) / 16)
            val (_, spaces, _, _) = FakeCodec.features(m.payload)
            PackCost(m.media_id, spaces + 1 + patches)
          })
        }.toDF()
        val sharded = costs.withColumn("shard",
          substring(md5(col("media_id").cast("string")), 1, 2))
        val w = Window.partitionBy("shard").orderBy(col("media_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sharded.withColumn("cum", sum(col("cost")).over(w))
          .select(col("media_id"), col("shard"), col("cost"),
            ((col("cum") - col("cost")) / lit(budget)).cast("long").as("seq"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) shard,
             |    (length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1)
             |    + (((1 + (ascii(substr(text, 1, 1)) % 640)) + 15) // 16)
             |      * (((1 + (ascii(substr(text, 2, 1)) % 480)) + 15) // 16) AS cost
             |  FROM documents),
             |c AS (SELECT doc_id, shard, cost,
             |    sum(cost) OVER (PARTITION BY shard ORDER BY doc_id
             |                    ROWS UNBOUNDED PRECEDING) cum
             |  FROM t)
             |SELECT doc_id AS media_id, shard, CAST(cost AS BIGINT) AS cost,
             |  CAST((cum - cost) // 2048 AS BIGINT) AS seq
             |FROM c""".stripMargin))
  )
}
