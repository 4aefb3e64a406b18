package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decoded per-partition — the Spark-side shape of an image/audio decode
  * stage in a training-data pipeline (reference analogue: PNG
  * encode/decode around the payload store, vector_db.py:67-72 and
  * vector_db_query.py:87-88).
  *
  * The decode itself is a STUB — this container has no image/audio codecs —
  * but it is a deterministic function of the bytes, so the surrounding
  * plumbing is real and oracle-checked: binary column in, `mapPartitions`
  * over a typed Dataset (the Scala analogue of a batched `mapInPandas`
  * decode UDF: per-partition iterator, one decoder init per task, no
  * per-row UDF dispatch), typed metadata struct out. Swapping the stub for
  * `javax.imageio`/ffmpeg changes only the function body, not the plan.
  */
object Multimodal {

  case class RawDoc(doc_id: Long, data: Array[Byte])
  case class DecodedMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, mean_byte: Double)

  /** Deterministic stand-in for an image decoder: derives "dimensions" and
    * a mean-byte "pixel statistic" from the raw bytes.
    */
  def decodeStub(r: RawDoc): DecodedMeta = {
    val n     = r.data.length.toLong
    val first = java.lang.Byte.toUnsignedInt(r.data(0)).toLong
    var sum   = 0.0
    var i     = 0
    while (i < r.data.length) { sum += java.lang.Byte.toUnsignedInt(r.data(i)); i += 1 }
    DecodedMeta(r.doc_id, n, 1L + n % 64L, 1L + first % 64L, sum / n)
  }

  /** q25_multimodal_decode — binary payload → per-partition decode →
    * typed metadata.
    */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[RawDoc]
    raw
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 6))
      .orderBy(col("doc_id"))
  }

  /** Oracle replicates the stub arithmetic in SQL (fixture text is ASCII,
    * so char positions == byte positions).
    */
  val q25OracleSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |         octet_length(encode(text)) AS n_bytes,
      |         ascii(substring(text, 1, 1)) AS first_byte,
      |         list_aggregate(list_transform(range(1, len(text) + 1),
      |           i -> CAST(ascii(substring(text, CAST(i AS INT), 1)) AS DOUBLE)), 'sum') AS byte_sum
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(n_bytes AS BIGINT) AS n_bytes,
      |       CAST(1 + n_bytes % 64 AS BIGINT) AS width,
      |       CAST(1 + first_byte % 64 AS BIGINT) AS height,
      |       round(byte_sum / n_bytes, 6) AS mean_byte
      |FROM b ORDER BY doc_id""".stripMargin
}
