package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level distributional statistics for a training-data pipeline:
  * CCNet-style perplexity bucketing (the head/middle/tail split the
  * CommonCrawl curation literature publishes) and a Zipf power-law fit
  * over the token frequency spectrum (the one-row report-card a corpus
  * build emits next to its counts).
  *
  * Both are REDUCE-side summaries of streams other declared operators
  * already audit (q78's bigram LM, q21's tokenizer): the corpus is
  * scanned, per-doc/per-type rows aggregate with map-side combine, and
  * everything past that is decision-scale.
  */
object CorpusStats {

  /** Tertile boundaries as double literals — spelled out in FULL so the
    * Scala plan and the oracle SQL parse the IDENTICAL nearest-double
    * (`1.0/3` computed in either engine would give the same value, but a
    * shorter literal like 0.333 would not).
    */
  val TertileLow  = "0.3333333333333333"
  val TertileHigh = "0.6666666666666666"

  /** q106_perplexity_bucket — CCNet-style PERPLEXITY BUCKETING (Wenzek et
    * al., LREC'20): every scored document lands in its language's head /
    * middle / tail tertile by bigram-LM score (q78's add-one bigram
    * log-probability — high avg_logp2 = low perplexity = "head", the
    * Wikipedia-like third CCNet keeps). Emits the per-(lang, bucket)
    * volume report: doc count and summed score (sum, not mean: a sum of
    * 6-dp values rounds deterministically at 6 dp, while a mean can land
    * on exact half-way points where the two engines' double rounding
    * disagrees — the q105 lesson applied to aggregates). Docs with < 2
    * tokens carry no bigram evidence and are outside the scored
    * population (the q78 convention, one level up).
    *
    * 100 TB: the scored stream is q78's audited two-aggregate shape; the
    * per-lang tertile cuts are exact interpolated-percentile AGGREGATES
    * (value-count buffers, the q79 discipline — never a percent_rank
    * window over corpus rows), the ≤ langs×2 cut table broadcasts back,
    * bucket assignment is a scan-side comparison, and the final
    * aggregate is (langs × 3)-scale. The scored stream feeds both
    * consumers (cut build + bucket cut) inside ONE action: the heavy LM
    * derivation ends at a doc_id hash exchange that ReusedExchange
    * shares between them (measured: a cache over the stream changed
    * nothing across the sf0.1→sf10 ladder), so no operator-scoped cache
    * is needed — a production pipeline persists the score column and
    * re-buckets without re-tokenizing.
    */
  def perplexityBucket(spark: SparkSession, sfDir: String): DataFrame =
    perplexityBucketOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, lang, …) corpus. */
  def perplexityBucketOf(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.bigramLogProbOf(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), col("doc_id"), col("avg_logp2"))
    val cuts = scored.groupBy(col("lang")).agg(
      expr(s"percentile(avg_logp2, $TertileLow)").as("c_low"),
      expr(s"percentile(avg_logp2, $TertileHigh)").as("c_high"))
    // both consumers of `scored` live in this ONE plan — the LM
    // pipeline's doc_id exchange is shared via ReusedExchange, so no
    // cache (whose lifetime a lazily-returned frame can't scope) is
    // needed, and the returned plan keeps its auditable lineage
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("avg_logp2") >= col("c_high"), lit("head"))
          .when(col("avg_logp2") >= col("c_low"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("avg_logp2")), 6).as("sum_logp2"))
      .orderBy(col("lang"), col("bucket"))
  }

  val q106OracleSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks FROM documents
      |), b AS (
      |  SELECT doc_id, toks[g.i] AS w1, toks[g.i+1] AS w2
      |  FROM d CROSS JOIN UNNEST(generate_series(1, length(toks)-1)) AS g(i)
      |  WHERE length(toks) >= 2
      |), bf AS (
      |  SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY w1, w2
      |), cf AS (
      |  SELECT w1, CAST(SUM(c12) AS DOUBLE) AS c1 FROM bf GROUP BY w1
      |), v AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS vocab FROM (
      |    SELECT DISTINCT unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token
      |    FROM documents)
      |), s AS (
      |  SELECT doc_id, round(avg(ln((c12 + 1) / (c1 + vocab))), 6) AS avg_logp2
      |  FROM b JOIN bf USING (w1, w2) JOIN cf USING (w1) CROSS JOIN v
      |  GROUP BY doc_id
      |), g AS (
      |  SELECT dd.lang, s.doc_id, s.avg_logp2 FROM s JOIN documents dd USING (doc_id)
      |), c AS (
      |  SELECT lang, quantile_cont(avg_logp2, $TertileLow) AS c_low,
      |         quantile_cont(avg_logp2, $TertileHigh) AS c_high
      |  FROM g GROUP BY lang
      |)
      |SELECT g.lang,
      |       CASE WHEN g.avg_logp2 >= c.c_high THEN 'head'
      |            WHEN g.avg_logp2 >= c.c_low THEN 'middle'
      |            ELSE 'tail' END AS bucket,
      |       COUNT(*) AS n_docs, round(SUM(g.avg_logp2), 6) AS sum_logp2
      |FROM g JOIN c USING (lang)
      |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** Frequency spectrum depth for the q109 fit. */
  val ZipfTopN = 1000

  /** q109_zipf_slope — ZIPF POWER-LAW FIT: the least-squares line through
    * (ln rank, ln freq) over the corpus' top-[[ZipfTopN]] token types
    * (rank ties broken token-asc), plus the total type count — the
    * one-row frequency-spectrum report card (Zipf's law: slope ≈ −1 for
    * natural text; a corpus whose slope drifts far off is boilerplate- or
    * spam-heavy before any per-doc filter can see it). slope/intercept/r2
    * are the regr_* aggregates both engines define identically
    * (covariance/variance form), rounded at 6 dp.
    *
    * 100 TB: the type table is a map-side-combined hash aggregate (the
    * q04 vocab shape); the top-[[ZipfTopN]] cut is `orderBy.limit` =
    * Spark's TakeOrderedAndProject (bounded per-partition heaps merged on
    * the driver — never a global sort or window over the vocab); ranking
    * numbers the [[ZipfTopN]] survivors via the sort_array/posexplode
    * fold (the q95 query-table discipline — no single-partition window),
    * and the regression is a 3-value aggregate over [[ZipfTopN]] rows.
    */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame =
    zipfSlopeOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def zipfSlopeOf(docs: DataFrame): DataFrame = {
    val types = docs
      .select(explode(TextPipeline.tokenArr(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val nTypes = types.agg(count(lit(1)).as("n_types"))
    val ranked = types
      .orderBy(col("freq").desc, col("token").asc).limit(ZipfTopN)
      .agg(sort_array(collect_list(
        struct((-col("freq")).as("negfreq"), col("token"), col("freq")))).as("rows"))
      .select(posexplode(col("rows")))
      .select((col("pos") + 1).cast("double").as("rank"),
        col("col.freq").cast("double").as("freq"))
    ranked
      .agg(
        round(expr("regr_slope(ln(freq), ln(rank))"), 6).as("slope"),
        round(expr("regr_intercept(ln(freq), ln(rank))"), 6).as("intercept"),
        round(expr("regr_r2(ln(freq), ln(rank))"), 6).as("r2"))
      .crossJoin(nTypes)
      .select(col("n_types"), col("slope"), col("intercept"), col("r2"))
  }

  val q109OracleSql: String =
    s"""WITH t AS (
      |  SELECT unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token FROM documents
      |), f AS (
      |  SELECT token, COUNT(*) AS freq FROM t GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_types FROM f
      |), top AS (
      |  SELECT token, freq FROM f ORDER BY freq DESC, token LIMIT $ZipfTopN
      |), r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS DOUBLE) AS rank,
      |         CAST(freq AS DOUBLE) AS freq
      |  FROM top
      |)
      |SELECT n.n_types,
      |       round(regr_slope(ln(freq), ln(rank)), 6) AS slope,
      |       round(regr_intercept(ln(freq), ln(rank)), 6) AS intercept,
      |       round(regr_r2(ln(freq), ln(rank)), 6) AS r2
      |FROM r CROSS JOIN n GROUP BY n.n_types""".stripMargin

  /** Longest n-gram order measured by q112. */
  val DiversityMaxN = 3

  /** q112_ngram_diversity — the DISTINCT-N diversity report (Li et al.,
    * NAACL'16): per (lang, n) for n = 1..[[DiversityMaxN]], the count of
    * distinct n-gram TYPES, total n-gram INSTANCES, and their ratio — the
    * repetitiveness report card a generation/curation pipeline publishes
    * next to its Zipf fit (q109): a low distinct-2/distinct-3 language
    * slice is template- or spam-heavy even when every individual doc
    * passes q51's within-doc repetition gate (the signal here is
    * CROSS-doc sameness at sub-shingle granularity).
    *
    * 100 TB: n-gram assembly is scan-local (the q78 zip-with-tail trick
    * per order — no window, no positional self-join); the type table is
    * a two-level hash aggregate — (lang, n, gram) partial counts map-side
    * combine before the only gram-scale shuffle, then (lang, n) sums are
    * (langs × 3)-scale. The gram shuffle carries TYPES per partition, the
    * q04 vocab argument; grams hash as strings, text never shuffles
    * whole-doc.
    */
  def ngramDiversity(spark: SparkSession, sfDir: String): DataFrame =
    ngramDiversityOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, lang, …) corpus. */
  def ngramDiversityOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("lang"), TextPipeline.tokenArr(col("text")).as("toks"))
    // every order's grams in one pass — each order via the q78
    // zip-with-tails trick (an index-probing lambda would re-run the
    // inlined tokenizer per element reference, the shingleSetsOf lesson)
    def gramsOfOrder(n: Int): org.apache.spark.sql.Column = {
      val gram =
        if (n == 1) transform(col("toks"), t =>
          struct(lit(1L).as("n"), t.as("gram")))
        else transform(
          arrays_zip((1 to n).map(j =>
            slice(col("toks"), lit(j), size(col("toks")) - (n - 1)).as(s"w$j")): _*),
          s => struct(lit(n.toLong).as("n"),
            concat_ws(" ", (1 to n).map(j => s.getField(s"w$j")): _*).as("gram")))
      when(size(col("toks")) >= n, gram)
        .otherwise(expr("array()").cast("array<struct<n:bigint,gram:string>>"))
    }
    val grams = toks.select(col("lang"),
      explode(flatten(array((1 to DiversityMaxN).map(gramsOfOrder): _*))).as("g"))
      .select(col("lang"), col("g.n").as("n"), col("g.gram").as("gram"))
    grams
      .groupBy(col("lang"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"), col("n"))
      .agg(count(lit(1)).as("types"), sum(col("c")).as("instances"))
      .select(col("lang"), col("n"), col("types"), col("instances"),
        round(col("types") / col("instances").cast("double"), 6).as("diversity"))
      .orderBy(col("lang"), col("n"))
  }

  /** One per-order arm of the oracle's gram stream (DuckDB's correlated
    * LATERAL over a cross-joined order table hits an internal binder
    * error, so the orders unroll as UNION ALL arms — q78's proven
    * generate_series pattern per arm).
    */
  private def gramArmSql(n: Int): String = {
    val concat = (0 until n).map(j => s"toks[g.i${if (j > 0) s"+$j" else ""}]").mkString(" || ' ' || ")
    s"""SELECT lang, CAST($n AS BIGINT) AS n, $concat AS gram
       |  FROM d CROSS JOIN UNNEST(generate_series(1, len(toks) - ${n - 1})) AS g(i)
       |  WHERE len(toks) >= $n""".stripMargin
  }

  val q112OracleSql: String =
    s"""WITH d AS (
      |  SELECT lang, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks FROM documents
      |), g AS (
      |  ${(1 to DiversityMaxN).map(gramArmSql).mkString("\n  UNION ALL\n  ")}
      |), t AS (
      |  SELECT lang, n, gram, COUNT(*) AS c FROM g GROUP BY lang, n, gram
      |)
      |SELECT lang, n, COUNT(*) AS types, CAST(SUM(c) AS BIGINT) AS instances,
      |       round(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS diversity
      |FROM t GROUP BY lang, n ORDER BY lang, n""".stripMargin

  /** Symmetric co-occurrence window (context words up to this many
    * positions away pair with the center — the word2vec/GloVe default
    * neighborhood scale), reported-pair count floor (the classic
    * collocation-extraction guard: PMI on singleton pairs is pure noise),
    * and the presentation cut.
    */
  val CoocWindow   = 4
  val CoocMinCount = 5
  val CoocTopK     = 200

  /** q115_pmi_cooccur — windowed CO-OCCURRENCE counts + PMI collocation
    * ranking (Church & Hanks, CL'90; the GloVe/word2vec co-occurrence
    * pass, Pennington et al. EMNLP'14 §3): every unordered token pair
    * within a [[CoocWindow]]-position window counts once per occurrence,
    * and pairs seen ≥ [[CoocMinCount]] times rank by pointwise mutual
    * information ln(P(a,b) / (P(a)·P(b))) — P(a,b) over the pair stream,
    * P(w) over the token stream. Emits the top-[[CoocTopK]] by
    * (rounded pmi desc, a, b): the deterministic presentation cut orders
    * on the 6-dp ROUNDED score so a last-ulp ln() divergence between
    * engines cannot flip the boundary (the q105 rounding lesson applied
    * to ordering).
    *
    * This is the TRAINING-DATA side of the embedding stack the search
    * family (q01/q24/q41…) consumes: the co-occurrence pair table IS the
    * input matrix GloVe factorizes and the implicit matrix SGNS shifts
    * (Levy & Goldberg, NeurIPS'14).
    *
    * 100 TB: pair assembly is SCAN-LOCAL (per-order slice+zip over the
    * token array — the q78/q112 idiom, never a positional self-join), so
    * the only corpus-scale shuffle carries pair TYPES with map-side
    * combine (Heaps-law sublinear, the q04 vocab argument). Unigram
    * counts join the pair-type table on each end — vocab-scale equi-joins,
    * broadcast by default with the q94 `broadcastCounts` escape hatch for
    * vocabularies past broadcast size. The two scalar totals broadcast,
    * and the cut is a TakeOrderedAndProject heap, never a global sort.
    */
  def pmiCooccur(spark: SparkSession, sfDir: String): DataFrame =
    pmiCooccurOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (text, …) corpus. */
  def pmiCooccurOf(docs: DataFrame, broadcastCounts: Boolean = true): DataFrame = {
    val toks = docs.select(TextPipeline.tokenArr(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("double").as("cw"))
    val nTok = uni.agg(sum(col("cw")).as("n_tok"))
    // all W offsets' pairs in one scan-local pass: offset d pairs toks[i]
    // with toks[i+d] via the slice+zip idiom (an index-probing lambda
    // would re-run the inlined tokenizer per element, the shingleSetsOf
    // lesson); unordered pairs canonicalize as (least, greatest)
    def pairsAtOffset(d: Int) = {
      val zipped = transform(
        arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - d).as("x"),
          slice(col("toks"), lit(1 + d), size(col("toks")) - d).as("y")),
        s => struct(least(s.getField("x"), s.getField("y")).as("a"),
          greatest(s.getField("x"), s.getField("y")).as("b")))
      when(size(col("toks")) > d, zipped)
        .otherwise(expr("array()").cast("array<struct<a:string,b:string>>"))
    }
    val pairCounts = toks
      .select(explode(flatten(array((1 to CoocWindow).map(pairsAtOffset): _*))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val nPairs = pairCounts.agg(sum(col("c_ab")).cast("double").as("n_pairs"))
    val kept = pairCounts.filter(col("c_ab") >= CoocMinCount)
    val withEnds =
      if (broadcastCounts)
        kept.join(broadcast(uni.withColumnRenamed("w", "a").withColumnRenamed("cw", "cw_a")), Seq("a"))
          .join(broadcast(uni.withColumnRenamed("w", "b").withColumnRenamed("cw", "cw_b")), Seq("b"))
      else
        kept.join(uni.withColumnRenamed("w", "a").withColumnRenamed("cw", "cw_a").hint("shuffle_hash"), Seq("a"))
          .join(uni.withColumnRenamed("w", "b").withColumnRenamed("cw", "cw_b").hint("shuffle_hash"), Seq("b"))
    withEnds
      .crossJoin(broadcast(nPairs))
      .crossJoin(broadcast(nTok))
      .select(col("a"), col("b"), col("c_ab"),
        round(log((col("c_ab") / col("n_pairs")) /
          ((col("cw_a") / col("n_tok")) * (col("cw_b") / col("n_tok")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(CoocTopK)
  }

  /** One per-offset arm of the oracle's pair stream (the q112 UNION ALL
    * unroll — DuckDB's correlated UNNEST over a cross-joined offset
    * table hits the same binder error).
    */
  private def coocArmSql(d: Int): String =
    s"""SELECT least(toks[g.i], toks[g.i+$d]) AS a, greatest(toks[g.i], toks[g.i+$d]) AS b
       |  FROM d CROSS JOIN UNNEST(generate_series(1, len(toks) - $d)) AS g(i)
       |  WHERE len(toks) > $d""".stripMargin

  val q115OracleSql: String =
    s"""WITH d AS (
      |  SELECT regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks FROM documents
      |), u AS (
      |  SELECT unnest(toks) AS w FROM d
      |), uc AS (
      |  SELECT w, CAST(COUNT(*) AS DOUBLE) AS cw FROM u GROUP BY w
      |), nt AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_tok FROM u
      |), p AS (
      |  ${(1 to CoocWindow).map(coocArmSql).mkString("\n  UNION ALL\n  ")}
      |), pc AS (
      |  SELECT a, b, COUNT(*) AS c_ab FROM p GROUP BY a, b
      |), np AS (
      |  SELECT CAST(SUM(c_ab) AS DOUBLE) AS n_pairs FROM pc
      |)
      |SELECT a, b, c_ab,
      |       round(ln((c_ab / n_pairs) / ((ua.cw / n_tok) * (ub.cw / n_tok))), 6) AS pmi
      |FROM pc JOIN uc ua ON pc.a = ua.w JOIN uc ub ON pc.b = ub.w
      |CROSS JOIN np CROSS JOIN nt
      |WHERE c_ab >= $CoocMinCount
      |ORDER BY pmi DESC, a, b LIMIT $CoocTopK""".stripMargin

  // ---------------------------------------------------------------------
  // N-gram novelty (q139)
  // ---------------------------------------------------------------------

  /** q139's gram order. */
  val NoveltyN = 4

  /** q139_ngram_novelty — VAL-VS-TRAIN MEMORIZATION AUDIT: the fraction
    * of each language's validation-split 4-gram TYPES never seen in the
    * training split — the n-gram novelty measure memorization studies
    * report (McCoy et al. TACL'23 "RAVEN" novelty; the Pile's dedup
    * ablations) and the cheap leakage canary next to the exact checks
    * (q60 decontamination, q83 leakage-safe splits): a val set whose
    * novelty collapses toward 0 is answerable from training memory
    * alone. Splits are q06's deterministic `doc_id % 10` convention.
    *
    * 100 TB: gram assembly is the scan-local slice+zip idiom (q112 —
    * never a positional self-join); each gram reduces SCAN-LOCALLY to a
    * 16-byte md5 fingerprint (the q16 fingerprint discipline — DuckDB
    * md5s the identical string, so a collision cannot diverge the
    * engines), then both sides reduce to per-lang fingerprint TYPE
    * tables (Heaps-sublinear) before the LEFT ANTI equi-join on
    * (lang, gram); the report is lang-scale. Neither corpus text nor
    * gram strings ever shuffle — only fixed-width fingerprint rows.
    */
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame =
    ngramNoveltyOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, lang, text, …) corpus. */
  def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val n = NoveltyN
    def gramTypes(part: DataFrame): DataFrame = part
      .select(col("lang"), TextPipeline.tokenArr(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("lang"), explode(array_distinct(transform(
        arrays_zip(
          (0 until n).map(i =>
            slice(col("toks"), lit(i + 1), size(col("toks")) - (n - 1)).as(s"w$i")): _*),
        s => unhex(md5(concat_ws(" ", (0 until n).map(i => s.getField(s"w$i")): _*)))))).as("gram"))
      .distinct()
    val train = gramTypes(docs.filter(pmod(col("doc_id"), lit(10)) < 9))
    val vals  = gramTypes(docs.filter(pmod(col("doc_id"), lit(10)) === 9))
    val novel = vals.join(train, Seq("lang", "gram"), "left_anti")
      .groupBy(col("lang")).agg(count(lit(1)).as("novel_grams"))
    vals.groupBy(col("lang")).agg(count(lit(1)).as("val_grams"))
      .join(novel, Seq("lang"), "left")
      .select(col("lang"), col("val_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        round(coalesce(col("novel_grams"), lit(0L)) / col("val_grams").cast("double"), 6)
          .as("novelty"))
      .orderBy(col("lang"))
  }

  val q139OracleSql: String = {
    val n = NoveltyN
    def gramCte(pred: String) =
      s"""SELECT DISTINCT lang,
         |         unhex(md5(array_to_string(toks[g.i : g.i + ${n - 1}], ' '))) AS gram
         |  FROM (SELECT lang, doc_id, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks
         |        FROM documents WHERE $pred) d
         |  CROSS JOIN UNNEST(generate_series(1, len(toks) - ${n - 1})) g(i)
         |  WHERE len(toks) >= $n""".stripMargin
    s"""WITH tr AS (
       |  ${gramCte("doc_id % 10 < 9")}
       |), va AS (
       |  ${gramCte("doc_id % 10 = 9")}
       |), nv AS (
       |  SELECT lang, COUNT(*) AS novel_grams FROM va
       |  WHERE NOT EXISTS (SELECT 1 FROM tr WHERE tr.lang = va.lang AND tr.gram = va.gram)
       |  GROUP BY lang
       |), vt AS (
       |  SELECT lang, COUNT(*) AS val_grams FROM va GROUP BY lang
       |)
       |SELECT vt.lang, vt.val_grams,
       |       COALESCE(nv.novel_grams, 0) AS novel_grams,
       |       round(COALESCE(nv.novel_grams, 0) / CAST(vt.val_grams AS DOUBLE), 6) AS novelty
       |FROM vt LEFT JOIN nv USING (lang) ORDER BY vt.lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Domain shift (q128)
  // ---------------------------------------------------------------------

  /** q128_domain_kl — per-SOURCE DOMAIN-SHIFT report: the KL divergence
    * KL(p_source ‖ p_corpus) of each source's unigram distribution from
    * the corpus-wide distribution, plus its token volume, vocabulary
    * size, and corpus-vocab coverage. This is the quantitative form of
    * "how different is this domain from the mixture" that importance
    * selection (q94 DSIR scores docs by exactly this log-ratio) and
    * mixture re-weighting (q61/q88) act on — the report a curation run
    * emits per ingested source BEFORE deciding its mixing weight. Every
    * source token appears in the corpus by construction, so q(t) > 0
    * and the sum is total (no smoothing needed — the clean property of
    * measuring components against their own mixture).
    *
    * 100 TB: ONE corpus scan ends at the (source, token) count
    * aggregate (map-side combined, Heaps-law sublinear rows); the
    * corpus-wide token counts derive from THAT table by summing out
    * source — never a second scan — and join back on token, a
    * vocab-scale equi-join. Per-source totals and the final KL sum are
    * aggregates over the same vocab-scale stream; nothing downstream of
    * the first aggregate is corpus-scale. No window, no collect.
    */
  def domainKl(spark: SparkSession, sfDir: String): DataFrame =
    domainKlOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (source, text, …) corpus. */
  def domainKlOf(docs: DataFrame): DataFrame = {
    val fs = docs
      .select(col("source"), explode(TextPipeline.tokenArr(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c_st"))
    // corpus counts from the (source, token) table — no second corpus pass
    val f = fs.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val corpusTotals = f.agg(sum(col("c_t")).cast("double").as("n_corpus"),
      count(lit(1)).cast("double").as("v_corpus"))
    val srcTotals = fs.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_src"), count(lit(1)).as("v_src"))
    fs.join(f, Seq("token"))
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(corpusTotals))
      .groupBy(col("source"))
      .agg(
        min(col("n_src")).as("n_tokens"),
        min(col("v_src")).as("vocab"),
        round(sum((col("c_st") / col("n_src").cast("double")) *
          log((col("c_st") / col("n_src").cast("double")) /
            (col("c_t") / col("n_corpus")))), 6).as("kl"),
        round(min(col("v_src")) / min(col("v_corpus")), 6).as("coverage"))
      .orderBy(col("source"))
  }

  val q128OracleSql: String =
    """WITH t AS (
      |  SELECT source, unnest(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1)) AS token
      |  FROM documents
      |), fs AS (
      |  SELECT source, token, COUNT(*) AS c_st FROM t GROUP BY source, token
      |), f AS (
      |  SELECT token, SUM(c_st) AS c_t FROM fs GROUP BY token
      |), ct AS (
      |  SELECT CAST(SUM(c_t) AS DOUBLE) AS n_corpus, CAST(COUNT(*) AS DOUBLE) AS v_corpus FROM f
      |), st AS (
      |  SELECT source, SUM(c_st) AS n_src, COUNT(*) AS v_src FROM fs GROUP BY source
      |)
      |SELECT fs.source,
      |       CAST(MIN(st.n_src) AS BIGINT) AS n_tokens,
      |       CAST(MIN(st.v_src) AS BIGINT) AS vocab,
      |       round(SUM((fs.c_st / CAST(st.n_src AS DOUBLE)) *
      |             ln((fs.c_st / CAST(st.n_src AS DOUBLE)) / (f.c_t / ct.n_corpus))), 6) AS kl,
      |       round(MIN(st.v_src) / MIN(ct.v_corpus), 6) AS coverage
      |FROM fs JOIN f USING (token) JOIN st USING (source) CROSS JOIN ct
      |GROUP BY fs.source ORDER BY fs.source""".stripMargin
}
