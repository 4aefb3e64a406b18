package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Scalar (int8-range) embedding quantization — the storage-side
  * compression every large vector store applies to float collections
  * (the reference stores raw float32 vectors, vector_db.py:88; scalar
  * quantization is the standard server-side option for exactly that
  * payload). At 100 TB, 4 bytes → 1 byte per dimension is the difference
  * between scanning 100 TB and scanning 25 TB on every probe.
  *
  * Per-VECTOR min/max codebook: `code = round((x - lo) / scale)` with
  * `scale = (hi - lo) / 255`, reconstruction `lo + code * scale`.
  * Entirely scan-local — zero shuffle, zero driver state; each row carries
  * its own 8-byte codebook (lo, hi). Every per-row bound (lo/hi/scale) is
  * bound as a COLUMN in its own projection before any lambda uses it:
  * an aggregate evaluated inside a `transform` lambda re-runs per element
  * (the O(dim²) trap q23 hit in round 1).
  */
object Quantize {

  /** q49_quantize_int8 — quantize each embedding to int8-range codes and
    * report the codebook plus reconstruction-error stats: a checksum over
    * the codes (`code_sum` hash-verifies every code against the oracle),
    * mean absolute error, and max absolute error.
    */
  def quantizeInt8(spark: SparkSession, sfDir: String): DataFrame =
    quantizeStats(Tables.embeddings(spark, sfDir))

  /** The quantize-and-report pipeline over any (vec_id, embedding) frame. */
  def quantizeStats(emb: DataFrame): DataFrame = {
    val bound = emb
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        array_min(col("v")).as("lo"), array_max(col("v")).as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
    val coded = bound.select(col("vec_id"), col("v"), col("lo"), col("hi"), col("scale"),
      when(col("scale") === lit(0.0), transform(col("v"), _ => lit(0.0)))
        .otherwise(transform(col("v"), x => round((x - col("lo")) / col("scale"), 0)))
        .as("codes"))
    coded
      .select(col("vec_id"), col("lo"), col("hi"), col("codes"),
        zip_with(col("v"), col("codes"),
          (x, q) => abs(x - (col("lo") + q * col("scale")))).as("err"))
      .select(
        col("vec_id"),
        round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"),
        aggregate(col("codes"), lit(0.0), (acc, q) => acc + q).cast("long").as("code_sum"),
        round(aggregate(col("err"), lit(0.0), (acc, e) => acc + e) / size(col("err")), 6).as("mae"),
        round(array_max(col("err")), 6).as("max_err"))
      .orderBy(col("vec_id"))
  }

  /** q144's clip width in standard deviations. */
  val CalibSigmas = 3.0

  /** q144_quant_calibrate — PER-DIMENSION QUANTIZATION CALIBRATION: the
    * corpus-wide μ ± 3σ clip bounds per embedding dimension and the
    * fraction of values they would clip — the calibration pass every
    * int8/product-quantization deployment runs BEFORE coding (q49
    * quantizes per-vector; real deployments calibrate per-DIM over the
    * corpus so one outlier dimension cannot blow the shared scale, and
    * the clip fraction is the knob's audit). Moment-based bounds (the
    * TensorRT/ONNX "entropy/minmax" family's cheap sibling) stay
    * oracle-expressible where exact per-dim percentiles would buffer
    * the corpus.
    *
    * Both passes are the q132 WIDE-AGGREGATE shape: pass 1 computes
    * 2·dim scan-local moment sums (no posexplode — the measured ×28
    * lesson), bounds round 6 dp on the driver (the q101/q132 pinned
    * intermediate discipline), and pass 2 counts clips against INLINED
    * literal bounds. Two bounded jobs, dim-scale driver state, the
    * corpus never shuffles; the returned report localizes (q105).
    */
  def quantCalibrate(spark: SparkSession, sfDir: String): DataFrame =
    quantCalibrateOf(Tables.embeddings(spark, sfDir))

  /** Composable core for ANY (embedding, …) frame. */
  def quantCalibrateOf(emb: DataFrame): DataFrame = {
    val dim = emb.select(size(col("embedding")).as("d")).head().getInt(0)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val momentCols =
      Seq(count(lit(1)).cast("double").as("n")) ++
      (1 to dim).map(d => sum(element_at(col("embedding"), d).cast("double")).as(s"s$d")) ++
      (1 to dim).map(d => sum(element_at(col("embedding"), d).cast("double") *
        element_at(col("embedding"), d).cast("double")).as(s"ss$d"))
    val m = emb.agg(momentCols.head, momentCols.tail: _*).head()
    val n = m.getDouble(0)
    val stats = (1 to dim).map { d =>
      val mu = m.getDouble(d) / n
      val sg = math.sqrt(math.max(0.0, m.getDouble(dim + d) / n - mu * mu))
      (r6(mu), r6(sg))
    }
    val bounds = stats.map { case (mu, sg) =>
      (r6(mu - CalibSigmas * sg), r6(mu + CalibSigmas * sg)) }
    val clipCols = (1 to dim).map { d =>
      val x = element_at(col("embedding"), d).cast("double")
      val (lo, hi) = bounds(d - 1)
      sum(when(x < lo || x > hi, 1L).otherwise(0L)).as(s"c$d")
    }
    val c = emb.agg(clipCols.head, clipCols.tail: _*).head()
    val sess = emb.sparkSession
    import sess.implicits._
    (1 to dim).map { d =>
      val (mu, sg) = stats(d - 1); val (lo, hi) = bounds(d - 1)
      (d.toLong, mu, sg, lo, hi, c.getLong(d - 1), r6(c.getLong(d - 1) / n))
    }.toDF("dim", "mu", "sigma", "lo", "hi", "n_clipped", "clip_frac")
      .orderBy(col("dim"))
  }

  val q144OracleSql: String =
    s"""WITH e AS (
      |  SELECT embedding FROM embeddings
      |), d AS (
      |  SELECT g.i AS dim, CAST(e.embedding[g.i] AS DOUBLE) AS x
      |  FROM e CROSS JOIN UNNEST(generate_series(1, len(e.embedding))) g(i)
      |), m AS (
      |  SELECT dim, CAST(COUNT(*) AS DOUBLE) AS n,
      |         round(SUM(x) / COUNT(*), 6) AS mu,
      |         round(sqrt(greatest(0.0, SUM(x * x) / COUNT(*)
      |               - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)))), 6) AS sigma
      |  FROM d GROUP BY dim
      |), b AS (
      |  SELECT dim, n, mu, sigma,
      |         round(mu - $CalibSigmas * sigma, 6) AS lo,
      |         round(mu + $CalibSigmas * sigma, 6) AS hi
      |  FROM m
      |)
      |SELECT b.dim, b.mu, b.sigma, b.lo, b.hi,
      |       CAST(SUM(CASE WHEN d.x < b.lo OR d.x > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      |       round(SUM(CASE WHEN d.x < b.lo OR d.x > b.hi THEN 1 ELSE 0 END) / b.n, 6) AS clip_frac
      |FROM d JOIN b USING (dim)
      |GROUP BY b.dim, b.mu, b.sigma, b.lo, b.hi, b.n
      |ORDER BY b.dim""".stripMargin

  val q49OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), b AS (
      |  SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi,
      |         (list_max(v) - list_min(v)) / 255.0 AS scale
      |  FROM e
      |), c AS (
      |  SELECT vec_id, v, lo, hi, scale,
      |         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
      |              ELSE list_transform(v, x -> round((x - lo) / scale)) END AS codes
      |  FROM b
      |), r AS (
      |  SELECT vec_id, lo, hi, codes,
      |         list_transform(range(1, len(v) + 1),
      |           i -> abs(v[CAST(i AS INT)] - (lo + codes[CAST(i AS INT)] * scale))) AS err
      |  FROM c
      |)
      |SELECT vec_id,
      |       round(lo, 6) AS lo,
      |       round(hi, 6) AS hi,
      |       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
      |       round(list_aggregate(err, 'sum') / len(err), 6) AS mae,
      |       round(list_max(err), 6) AS max_err
      |FROM r ORDER BY vec_id""".stripMargin
}
