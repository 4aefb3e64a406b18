package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Embedding-UDF surface (SURVEY.md §2A P7–P9): the reference's only
  * extension points are its three model embedders — ResNet-50 over images
  * (reference: vector_db.py:55-63), CLIP over images
  * (reference: text_img.py:33-39), and CLIP over text
  * (reference: text_img.py:66-71). This operator is the Spark-shaped socket
  * a real encoder plugs into: `mapPartitions` over the rows with ONE
  * encoder initialization per partition (model load costs seconds — per-row
  * init would dominate the job), every row of the partition streamed
  * through the open encoder. It is the Scala analogue of an iterator-based
  * (`mapInPandas`-style) batch UDF, and the same pattern as
  * [[Multimodal.multimodalDecode]]'s per-partition decode.
  *
  * A real CLIP/ResNet drops in by supplying an `encoderFactory` whose
  * returned closure holds the loaded model; nothing about the plan changes.
  * The bundled [[Embed.hashingTextEncoder]] is a deterministic, model-free
  * stand-in (char-trigram feature hashing, L2-normalized) so the operator
  * is fully testable in this container.
  */
object Embed {

  /** Append `outputCol: array<float>` to `df` by running every value of
    * `inputCol` (String or Array[Byte] — anything the encoder accepts)
    * through an encoder that is constructed once per partition.
    *
    * @param encoderFactory called once per partition, on the executor; the
    *                       returned function embeds one value. Model
    *                       loading belongs in the factory body.
    */
  def embedColumn[T](
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      encoderFactory: () => T => Array[Float]): DataFrame = {
    val outSchema = df.schema.add(outputCol, ArrayType(FloatType))
    val inIdx     = df.schema.fieldIndex(inputCol)
    df.mapPartitions { rows =>
      val embed = encoderFactory() // one init per partition / task
      rows.map(r => Row.fromSeq(r.toSeq :+ embed(r.getAs[T](inIdx)).toSeq))
    }(Encoders.row(outSchema))
  }

  /** Deterministic toy text encoder: char-trigram feature hashing into
    * `dim` buckets, L2-normalized. Stands in for CLIP's text tower
    * (reference: text_img.py:66-71) — same signature, no model weights.
    */
  def hashingTextEncoder(dim: Int): () => String => Array[Float] =
    () => { text =>
      val v = new Array[Float](dim)
      val s = " " + text.toLowerCase + " "
      var i = 0
      while (i + 3 <= s.length) {
        val h = scala.util.hashing.MurmurHash3.stringHash(s.substring(i, i + 3))
        v(math.floorMod(h, dim)) += 1f
        i += 1
      }
      var norm = 0.0
      var j    = 0
      while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
      val n = math.sqrt(norm)
      if (n > 0) { var k = 0; while (k < dim) { v(k) = (v(k) / n).toFloat; k += 1 } }
      v
    }
}
