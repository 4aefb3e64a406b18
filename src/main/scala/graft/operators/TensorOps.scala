package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.toDouble

/** Tensor-shaped scalar functions from the reference's training scripts,
  * expressed as array-column operators: padding masks
  * (reference: transformer_sample.py:551 `(input != pad).int()`), softmax
  * (reference: transformer_sample.py:153), and relu
  * (reference: transformer_sample.py:116 → `greatest(x, 0)`). All pure
  * per-row array expressions — scan-local, no shuffle.
  */
object TensorOps {

  /** q33_padding_mask — the attention padding mask over the q05 encoded
    * sequences: 1 where the position holds a real token (SOS/EOS count as
    * attendable, matching the reference's mask), 0 on [PAD]; plus the real
    * length.
    */
  def paddingMask(spark: SparkSession, sfDir: String): DataFrame =
    TextPipeline.tokenizePad(spark, sfDir)
      .select(
        col("doc_id"),
        transform(col("token_ids"), x => when(x === TextPipeline.PadId, 0L).otherwise(1L)).as("mask_arr"))
      .select(
        col("doc_id"),
        // serialized for the driver's pandas compare (cannot sort ndarray
        // cells, VERDICT r1 item 1); the array form is `mask_arr` above
        array_join(col("mask_arr"), " ").as("mask"),
        aggregate(col("mask_arr"), lit(0L), (acc, x) => acc + x).as("n_attend"))
      .orderBy(col("doc_id"))

  val q33OracleSql: String =
    s"""WITH toks0 AS (
       |  SELECT doc_id, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS l FROM documents
       |), freqs AS (
       |  SELECT token, COUNT(*) AS freq
       |  FROM (SELECT unnest(l) AS token FROM toks0) GROUP BY token HAVING COUNT(*) >= 2
       |), vocab AS (
       |  SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) + 3 AS BIGINT) AS id FROM freqs
       |), toks AS (
       |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS token FROM toks0
       |), joined AS (
       |  SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS id
       |  FROM toks t LEFT JOIN vocab v USING (token)
       |), seqs AS (
       |  SELECT doc_id, list(id ORDER BY pos) AS ids FROM joined GROUP BY doc_id
       |), padded AS (
       |  SELECT doc_id,
       |         [CAST(2 AS BIGINT)] || ids || [CAST(3 AS BIGINT)]
       |           || list_transform(range(${TextPipeline.SeqLen} - 2 - len(ids)), x -> CAST(1 AS BIGINT)) AS token_ids
       |  FROM seqs
       |  WHERE len(ids) <= ${TextPipeline.SeqLen} - 2
       |)
       |SELECT doc_id,
       |       array_to_string(list_transform(token_ids, x -> CAST(CASE WHEN x = 1 THEN 0 ELSE 1 END AS BIGINT)), ' ') AS mask,
       |       CAST(list_aggregate(list_transform(token_ids, x -> CASE WHEN x = 1 THEN 0 ELSE 1 END), 'sum') AS BIGINT) AS n_attend
       |FROM padded ORDER BY doc_id""".stripMargin

  /** q34_softmax_relu — softmax over the first 8 embedding dimensions and
    * the fraction of non-negative components (relu support), per vector.
    */
  def softmaxRelu(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), slice(toDouble(col("embedding")), 1, 8).as("v"),
        toDouble(col("embedding")).as("fullv"))
      .withColumn("z", aggregate(col("v"), lit(0.0), (acc, x) => acc + exp(x)))
      .select(
        col("vec_id"),
        // %.6f string serialization (driver-hashable; `+ 0.0` folds -0.0 to
        // +0.0 so both engines print identically)
        array_join(
          transform(col("v"), x => format_string("%.6f", round(exp(x) / col("z"), 6) + lit(0.0))),
          ",").as("softmax8"),
        round(
          aggregate(col("fullv"), lit(0.0), (acc, x) => acc + when(greatest(x, lit(0.0)) === x, 1.0).otherwise(0.0))
            / size(col("fullv")), 6).as("nonneg_frac"))
      .orderBy(col("vec_id"))

  /** q42_decode_step — the two remaining tensor-shaped reference ops as
    * array expressions: greedy argmax decode (T3;
    * reference: transformer_sample.py:587 `torch.max(prob, dim=1)`) via
    * `array_position(v, array_max(v))`, and the causal (lower-triangular)
    * attention mask (F7; reference: transformer_sample.py:462-465) built
    * per row for a data-dependent size n, emitted flattened. Both are
    * scan-local — no shuffle, no UDF.
    */
  def decodeStep(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), slice(toDouble(col("embedding")), 1, 8).as("v"),
        ((col("vec_id") % 4) + 3).cast("int").as("n"))
      .select(
        col("vec_id"),
        array_position(col("v"), array_max(col("v"))).cast("long").as("argmax_pos"),
        col("n").cast("long").as("n"),
        array_join(flatten(expr(
          "transform(sequence(1, n), i -> transform(sequence(1, n), " +
            "j -> cast(case when j <= i then 1 else 0 end as bigint)))")), " ").as("causal_mask"))
      .orderBy(col("vec_id"))

  /** q71_greedy_decode — the reference's greedy decode LOOP (T3;
    * reference: transformer_sample.py:562-595: iterate argmax-next until
    * EOS or the length budget) as a dataflow operator; q42 declares one
    * step, this row runs the whole loop. The model call is stubbed by a
    * deterministic affine next-token map (t → (7t+3) mod 32, EOS = 0) —
    * the same honest-stub convention as the multimodal codec socket: the
    * loop structure, both stopping conditions (EOS hit vs budget
    * exhausted), and the per-row state threading are real; a real scorer
    * replaces the transition, nothing else changes. Scan-local: ONE
    * `aggregate` HOF over the step-budget sequence with an array
    * accumulator — no shuffle, no UDF, no driver-side loop, rows decode
    * partition-parallel (each row's loop is independent, exactly why
    * batch greedy decode parallelizes).
    */
  def greedyDecode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("aggregate(sequence(1, 11), array(cast(vec_id % 32 as bigint)), " +
          "(acc, i) -> case when element_at(acc, -1) = 0 then acc " +
          "else concat(acc, array((7 * element_at(acc, -1) + 3) % 32)) end)").as("toks"))
      .select(
        col("vec_id"),
        array_join(transform(col("toks"), _.cast("string")), " ").as("tokens"),
        (size(col("toks")) - 1).cast("long").as("n_steps"),
        (element_at(col("toks"), -1) === 0).as("hit_eos"))
      .orderBy(col("vec_id"))

  val q71OracleSql: String =
    """WITH RECURSIVE dec(vec_id, step, tok) AS (
      |  SELECT vec_id, 0 AS step, CAST(vec_id % 32 AS BIGINT) AS tok FROM embeddings
      |  UNION ALL
      |  SELECT vec_id, step + 1, (7 * tok + 3) % 32 FROM dec WHERE tok <> 0 AND step < 11
      |)
      |SELECT vec_id,
      |       string_agg(CAST(tok AS VARCHAR), ' ' ORDER BY step) AS tokens,
      |       CAST(MAX(step) AS BIGINT) AS n_steps,
      |       bool_or(tok = 0) AS hit_eos
      |FROM dec GROUP BY vec_id ORDER BY vec_id""".stripMargin

  val q42OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, (embedding::DOUBLE[])[1:8] AS v,
      |         CAST(vec_id % 4 + 3 AS INT) AS n
      |  FROM embeddings
      |)
      |SELECT vec_id,
      |       CAST(list_position(v, list_aggregate(v, 'max')) AS BIGINT) AS argmax_pos,
      |       CAST(n AS BIGINT) AS n,
      |       array_to_string(flatten(list_transform(range(1, n + 1),
      |         i -> list_transform(range(1, n + 1),
      |           j -> CAST(CASE WHEN j <= i THEN 1 ELSE 0 END AS BIGINT)))), ' ') AS causal_mask
      |FROM e ORDER BY vec_id""".stripMargin

  /** q43_layernorm — layer normalization over the first 8 embedding dims
    * (F10; reference: transformer_sample.py:94-97): per-vector mean and
    * biased std (E[x²]−E[x]², the reference's torch default), components
    * standardized with eps=1e-5. Mean/std bound ONCE per row as columns —
    * never inside the transform lambda (HOFs don't codegen; see
    * VectorFunctions.normalize).
    */
  def layerNorm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), slice(toDouble(col("embedding")), 1, 8).as("v"))
      .withColumn("mu", aggregate(col("v"), lit(0.0), (a, x) => a + x) / size(col("v")))
      .withColumn("sq", aggregate(col("v"), lit(0.0), (a, x) => a + x * x) / size(col("v")))
      .withColumn("sd", sqrt(col("sq") - col("mu") * col("mu") + lit(1e-5)))
      .select(
        col("vec_id"),
        round(col("mu"), 6).as("mean"),
        round(col("sd"), 6).as("std"),
        array_join(
          transform(col("v"), x => format_string("%.6f", round((x - col("mu")) / col("sd"), 6) + lit(0.0))),
          ",").as("normed"))
      .orderBy(col("vec_id"))

  val q43OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, (embedding::DOUBLE[])[1:8] AS v FROM embeddings
      |), m AS (
      |  SELECT vec_id, v,
      |         list_aggregate(v, 'sum') / len(v) AS mu,
      |         list_aggregate(list_transform(v, x -> x * x), 'sum') / len(v) AS sq
      |  FROM e
      |), s AS (
      |  SELECT vec_id, v, mu, sqrt(sq - mu * mu + 1e-5) AS sd FROM m
      |)
      |SELECT vec_id,
      |       round(mu, 6) AS mean,
      |       round(sd, 6) AS std,
      |       array_to_string(list_transform(v, x -> printf('%.6f', round((x - mu) / sd, 6) + 0.0)), ',') AS normed
      |FROM s ORDER BY vec_id""".stripMargin

  val q34OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS fullv, (embedding::DOUBLE[])[1:8] AS v FROM embeddings
      |), z AS (
      |  SELECT vec_id, fullv, v,
      |         list_aggregate(list_transform(v, x -> exp(x)), 'sum') AS z
      |  FROM e
      |)
      |SELECT vec_id,
      |       array_to_string(list_transform(v, x -> printf('%.6f', round(exp(x) / z, 6) + 0.0)), ',') AS softmax8,
      |       round(list_aggregate(list_transform(fullv, x -> CASE WHEN greatest(x, 0.0) = x THEN 1.0 ELSE 0.0 END), 'sum')
      |             / len(fullv), 6) AS nonneg_frac
      |FROM z ORDER BY vec_id""".stripMargin
}
