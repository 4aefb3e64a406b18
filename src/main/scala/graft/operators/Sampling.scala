package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic EXACT-K uniform sampling per group — the inspection /
  * eval-subset stage of a curation pipeline ("pull 25 random docs per
  * language for review"): rank docs by a hash of their id and keep each
  * group's K smallest. Hash-rank sampling is uniform (the hash is
  * order-independent of any doc attribute), reproducible (no RNG state,
  * bit-identical re-runs — the q81 convention), and EXACT-K, which
  * Bernoulli gates (q61's hash gate) cannot promise.
  *
  * Scale: ranking uses the bounded-heap [[TopK]] Aggregator, NOT a
  * row_number window — the window funnels every corpus row of a language
  * through one reducer; the heap ships ≤ groups × partitions × K tiny
  * rows at any corpus size (q76's argument, with the hash as the score).
  *
  * The hash score is the first 12 md5 nibbles decoded to a number —
  * 48 bits, exactly representable in double, decoded with the
  * [[DedupExtras]] instr-nibble pattern so the DuckDB oracle computes the
  * identical layout (no engine-specific hex-to-int builtin in either
  * plan).
  */
object Sampling {

  val SampleK = 25

  /** Numeric value of the first 12 hex nibbles of `h` (exact in double). */
  private def nibbleValue(h: Column): Column =
    (0 until 12).map { i =>
      expr(s"instr('0123456789abcdef', substr(_h, ${i + 1}, 1)) - 1").cast("double") *
        lit(math.pow(16, 11 - i))
    }.reduce(_ + _)

  /** q82_lang_sample — 25 docs per language, uniformly by id hash. */
  def langSample(spark: SparkSession, sfDir: String): DataFrame =
    sampleByOf(Tables.documents(spark, sfDir), Seq("lang"), SampleK)

  /** Composable core for ANY frame with `doc_id` + grouping columns:
    * (group cols, rank, doc_id), rank 1..K by (hash asc, doc_id asc).
    * TopK ranks best-first by (score DESC, id asc), so the score is the
    * NEGATED hash value.
    */
  def sampleByOf(docs: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val tk = TopK.topKUdaf(k)
    val gs = groupCols.map(col)
    docs
      .withColumn("_h", md5(concat(lit("sample:"), col("doc_id"))))
      .withColumn("_score", -nibbleValue(col("_h")))
      .groupBy(gs: _*)
      .agg(tk(col("doc_id"), col("_score")).as("top"))
      .select(gs :+ posexplode(col("top")): _*)
      .toDF(groupCols ++ Seq("pos", "s"): _*)
      .select(gs ++ Seq((col("pos") + 1).cast("long").as("rank"), col("s.id").as("doc_id")): _*)
      .orderBy(gs :+ col("rank"): _*)
  }

  val q82OracleSql: String = {
    val hv = (0 until 12).map { i =>
      s"(strpos('0123456789abcdef', substring(skey, ${i + 1}, 1)) - 1) * ${math.pow(16, 11 - i).toLong}.0"
    }.mkString("\n           + ")
    s"""WITH keyed AS (
       |  SELECT lang, doc_id, md5('sample:' || doc_id) AS skey FROM documents
       |), hv AS (
       |  SELECT lang, doc_id,
       |         $hv AS hv
       |  FROM keyed
       |), r AS (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rank
       |  FROM hv
       |)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
       |FROM r WHERE rank <= $SampleK
       |ORDER BY lang, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Temperature resampling (q88)
  // ---------------------------------------------------------------------

  /** q88_temperature_resample — temperature-scaled LANGUAGE resampling,
    * the multilingual mixing step (mT5/XLM-R style): natural language
    * shares p_l are flattened to p_l^α before training so high-resource
    * languages stop drowning the tail. Realized by pure downsampling
    * (never upsampling): kept_l ∝ n_l^α means per-language accept rate
    * a_l ∝ n_l^(α-1), normalized so the SMALLEST language passes whole.
    *
    * α is fixed at 1/2 — inside the standard 0.3–0.7 band, and the one
    * exponent with an exactly-cross-engine closed form: a_l =
    * sqrt(n_min / n_l), and IEEE-754 requires division and sqrt to be
    * correctly rounded, so the oracle's thresholds are BIT-IDENTICAL to
    * the engine's (a general pow() has no such guarantee — JVM
    * Math.pow and a C library may differ in the last ulp, and the
    * floor(rate·2^20) gate would amplify exactly that ulp at a bucket
    * boundary). q61 (α→0, balance-to-smallest) and the natural corpus
    * (α=1) are this family's endpoints.
    *
    * Per-doc keep is q61's deterministic multiplicative hash gate —
    * reproducible, join-stable, RNG-free. The plan is the 100 TB shape:
    * one lang-cardinality count aggregate comes to the driver once and
    * broadcasts back as a literal rate table; the gate itself is a
    * scan-local predicate — the corpus never shuffles.
    */
  def temperatureResample(spark: SparkSession, sfDir: String): DataFrame =
    temperatureResampleOf(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")))
      .orderBy(col("doc_id"))

  /** Composable core for ANY (doc_id, lang, …) corpus: keeps each row
    * with probability sqrt(n_min / n_lang), decided by the doc_id hash
    * gate; all caller columns preserved on kept rows.
    */
  def temperatureResampleOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      .as[(String, Long)].collect()
    val minN = counts.map(_._2).min
    val rates = counts.toSeq
      .map { case (l, nl) => (l, math.sqrt(minN.toDouble / nl)) }.toDF("lang", "rate")
    docs.join(broadcast(rates), Seq("lang"))
      .filter(pmod(col("doc_id") * lit(2654435761L), lit(1048576L)) <
        floor(col("rate") * lit(1048576.0)).cast("long"))
      .select(docs.columns.map(col).toSeq: _*)
  }

  // ---------------------------------------------------------------------
  // Weighted PPS sampling (q129)
  // ---------------------------------------------------------------------

  /** Expected sample size per language for q129. */
  val PpsTargetK = 40

  /** q129_pps_sample — WEIGHTED Poisson-PPS sampling per language:
    * every document is kept independently with inclusion probability
    * p_i = min(1, K·w_i / W_lang), w_i its n_chars weight and W_lang the
    * language's weight total — probability-proportional-to-SIZE sampling
    * (Poisson sampling, Hájek '64; the survey-sampling design curation
    * stacks reuse when "sample 40 docs per lang" must favor the docs
    * that carry the tokens). q82 is this operator's uniform-weight
    * special case; q88 reweights whole LANGUAGES, this reweights DOCS.
    *
    * The keep decision is q88's deterministic multiplicative hash gate
    * against an INTEGER threshold floor(K·w_i·2^20 / W_lang), computed
    * entirely in int64 arithmetic — exact in both engines, no pow(), no
    * float boundary to straddle (the q88 ulp argument, strengthened:
    * here not even sqrt is needed). The emitted p_micro column IS that
    * threshold (in 2^-20 units), so the inclusion probability is
    * auditable without a lossy rounded double.
    *
    * 100 TB: one per-lang weight-total aggregate (map-side combined,
    * lang-scale result) broadcasts back; the gate is a scan-local
    * integer predicate — the corpus never shuffles. Horvitz-Thompson
    * estimators downstream divide by p_micro/2^20.
    */
  def ppsSample(spark: SparkSession, sfDir: String): DataFrame =
    ppsSampleOf(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars")))
      .orderBy(col("doc_id"))

  /** Composable core for ANY (doc_id, lang, n_chars, …) corpus: keeps
    * each row with probability ∝ its n_chars weight, expected
    * [[PpsTargetK]] rows per lang; all caller columns preserved, plus
    * the integer inclusion threshold `p_micro` (2^-20 units).
    */
  def ppsSampleOf(docs: DataFrame): DataFrame = {
    val totals = docs.groupBy(col("lang")).agg(sum(col("n_chars")).as("w_lang"))
    docs.join(broadcast(totals), Seq("lang"))
      .withColumn("p_micro",
        least(lit(1048576L),
          expr(s"($PpsTargetK * n_chars * 1048576) div w_lang")))
      .filter(pmod(col("doc_id") * lit(2246822519L), lit(1048576L)) < col("p_micro"))
      .select(docs.columns.map(col).toSeq :+ col("p_micro"): _*)
  }

  val q129OracleSql: String =
    s"""WITH w AS (
       |  SELECT lang, SUM(n_chars) AS w_lang FROM documents GROUP BY lang
       |), g AS (
       |  SELECT d.doc_id, d.lang, d.n_chars,
       |         least(1048576, ($PpsTargetK * d.n_chars * 1048576) // w.w_lang) AS p_micro
       |  FROM documents d JOIN w USING (lang)
       |)
       |SELECT doc_id, lang, n_chars, CAST(p_micro AS BIGINT) AS p_micro
       |FROM g
       |WHERE (doc_id * 2246822519) % 1048576 < p_micro
       |ORDER BY doc_id""".stripMargin

  val q88OracleSql: String =
    """WITH n AS (
      |  SELECT lang, COUNT(*) AS nl FROM documents GROUP BY lang
      |), r AS (
      |  SELECT lang, sqrt((SELECT MIN(nl) FROM n)::DOUBLE / nl) AS rate FROM n
      |)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN r USING (lang)
      |WHERE (d.doc_id * 2654435761) % 1048576 < CAST(floor(rate * 1048576) AS BIGINT)
      |ORDER BY d.doc_id""".stripMargin
}
