package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality validation — the Deequ/Great-Expectations axis: a
  * declarative constraint suite over the warehouse evaluated in bulk,
  * emitting one (rule, violations, total, pass) row per rule. A 100 TB
  * ingest runs exactly this before anything downstream trusts the
  * batch; it is the operational complement to the statistical audits
  * (q109/q117/q119/q120).
  */
object Quality {

  /** q126_data_quality — the constraint report over the fixture
    * warehouse: range rules, uniqueness, referential integrity (both
    * fact→dim edges), representation consistency (documents.n_chars
    * must equal length(text)), and two deliberately TIGHT business
    * rules (discount ≤ 5 %, tax ≤ 6 %) that flag real rows — a
    * non-degenerate mix of passing constraints and failing audits, the
    * shape a production run actually produces.
    *
    * 100 TB: every range/consistency rule for a table folds into ONE
    * scan's aggregate (a sum of CASE predicates, map-side combined —
    * adding a rule adds a column, not a pass); uniqueness is the
    * two-level distinct count on the key; each FK rule is one
    * anti-join whose dimension side broadcasts (or shuffles on the key
    * at dim scale — the q45 keeper-set discipline). The report is
    * rule-scale. Nothing recomputes per rule.
    */
  def dataQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    val scans = ruleRowsOf(li,
      "li_discount_le_5pct" -> (col("l_discount") > 0.05),
      "li_quantity_in_1_50" -> !col("l_quantity").between(1.0, 50.0),
      "li_tax_le_6pct" -> (col("l_tax") > 0.06))
      .unionByName(ruleRowsOf(docs,
        "docs_nchars_consistent" -> (col("n_chars") =!= length(col("text"))),
        "docs_text_nonempty" -> (col("text").isNull || length(col("text")) === 0)))
      .unionByName(ruleRowsOf(events,
        "events_ts_in_2024" -> !col("ts").between(
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
          lit(java.sql.Timestamp.valueOf("2024-12-31 23:59:59.999999")) ),
        "events_value_nonneg" -> (col("value") < 0)))

    val unique = orders.agg(count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
      .select(lit("orders_orderkey_unique").as("rule"), col("violations"), col("total"))

    def fk(name: String, fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String): DataFrame = {
      val orphans = fact.select(col(factKey))
        .join(broadcast(dim.select(col(dimKey))), col(factKey) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
      fact.agg(count(lit(1)).as("total")).crossJoin(orphans)
        .select(lit(name).as("rule"), col("violations"), col("total"))
    }

    scans
      .unionByName(unique)
      .unionByName(fk("li_orderkey_fk", li, "l_orderkey", orders, "o_orderkey"))
      .unionByName(fk("orders_custkey_fk", orders, "o_custkey", customer, "c_custkey"))
      .select(col("rule"), col("violations"), col("total"),
        (col("violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }

  /** One table's predicate rules folded into ONE aggregate pass, then
    * exploded to (rule, violations, total) rows — adding a rule adds a
    * CASE-sum column, never another scan.
    */
  private[graft] def ruleRowsOf(df: DataFrame, checks: (String, Column)*): DataFrame = {
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val agg = df.agg(count(lit(1)).as("total"),
      checks.zipWithIndex.map { case ((_, c), i) => cnt(c).as(s"v$i") }: _*)
    agg.select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"v$i").as("violations"), col("total"))
    }: _*)).as("r")).select(col("r.rule"), col("r.violations"), col("r.total"))
  }

  /** The q130 stage names, in gate order. */
  val FunnelRules: Seq[String] = Seq(
    "min_tokens_20", "stopword_ge_2pct", "punct_le_30pct",
    "distinct_ge_30pct", "avg_tok_len_2_12")

  /** q130_filter_funnel — the CURATION FILTER FUNNEL: five quality gates
    * applied in sequence (C4/Gopher-style: length floor, stopword
    * floor, punctuation ceiling, distinct-token floor, token-length
    * band), reporting per stage how many documents entered, dropped,
    * and survived — the survival table every dataset paper publishes
    * (RefinedWeb Fig. 2, FineWeb's filtering ablations) and the first
    * diagnostic a pipeline owner reads when a corpus shrinks
    * unexpectedly. Complements q20 (the scores) and q126 (per-rule
    * INDEPENDENT counts): the funnel is SEQUENTIAL — a doc dropped at
    * stage 2 never reaches stage 3 — so stage counts compose, n_out(k)
    * = n_in(k+1).
    *
    * Every gate is an INTEGER cross-multiplication (n_stop·50 <
    * n_tokens, not n_stop/n_tokens < 0.02) — no float ratio ever meets
    * a threshold, so no ulp/rounding boundary exists anywhere in the
    * keep/drop decision (the q66 fixed-point lesson applied at design
    * time). Only the reported drop_rate is a rounded double.
    *
    * 100 TB: one token-stream pass per doc (map-side combined; the
    * distinct-token count is the standard two-level expansion), a
    * scan-side first-failing-stage CASE, ONE stage-count aggregate
    * (≤ 6 cells), and a literal-unrolled cumulative select — no window,
    * no second scan, report is stage-scale.
    */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame =
    filterFunnelOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def filterFunnelOf(docs: DataFrame): DataFrame = {
    val stop = TextAnalysis.EnStopwords.map(s => s"'$s'").mkString("(", ",", ")")
    val feats = docs
      .select(col("doc_id"), explode(TextPipeline.tokenArr(col("text"))).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(expr(s"CASE WHEN tok IN $stop THEN 1 ELSE 0 END")).as("n_stop"),
        sum(expr("CASE WHEN tok RLIKE '^[^a-z0-9]+$' THEN 1 ELSE 0 END")).as("n_punct"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(length(col("tok"))).as("n_tok_chars"))
    val firstFail = feats.withColumn("first_fail",
      when(col("n_tokens") < 20, 1)
        .when(col("n_stop") * 50 < col("n_tokens"), 2)
        .when(col("n_punct") * 10 > col("n_tokens") * 3, 3)
        .when(col("n_distinct") * 10 < col("n_tokens") * 3, 4)
        .when(col("n_tok_chars") < col("n_tokens") * 2 ||
          col("n_tok_chars") > col("n_tokens") * 12, 5)
        .otherwise(0))
    val counts = firstFail.agg(
      count(lit(1)).as("total"),
      (1 to FunnelRules.size).map(k =>
        sum(when(col("first_fail") === k, 1L).otherwise(0L)).as(s"d$k")): _*)
    // literal-unrolled cumulative funnel — n_in(k) = total - Σ_{j<k} d_j
    val stageRows = FunnelRules.zipWithIndex.map { case (name, i) =>
      val k = i + 1
      val nIn = (1 until k).foldLeft(col("total"))((acc, j) => acc - col(s"d$j"))
      struct(lit(k.toLong).as("stage"), lit(name).as("rule"),
        nIn.as("n_in"), col(s"d$k").as("n_dropped"),
        (nIn - col(s"d$k")).as("n_out"),
        round(col(s"d$k") / nIn.cast("double"), 6).as("drop_rate"))
    }
    counts.select(explode(array(stageRows: _*)).as("r"))
      .select(col("r.stage"), col("r.rule"), col("r.n_in"),
        col("r.n_dropped"), col("r.n_out"), col("r.drop_rate"))
      .orderBy(col("stage"))
  }

  val q130OracleSql: String = {
    val stop = TextAnalysis.EnStopwords.map(s => s"'$s'").mkString("(", ",", ")")
    val armSql = FunnelRules.zipWithIndex.map { case (name, i) =>
      val k = i + 1
      val nIn = "total" + (1 until k).map(j => s" - d$j").mkString
      s"""SELECT ${k}::BIGINT AS stage, '$name' AS rule, $nIn AS n_in, d$k AS n_dropped,
         |         $nIn - d$k AS n_out,
         |         round(d$k / CAST($nIn AS DOUBLE), 6) AS drop_rate FROM c""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS tok FROM documents
       |), f AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |         SUM(CASE WHEN tok IN $stop THEN 1 ELSE 0 END) AS n_stop,
       |         SUM(CASE WHEN regexp_matches(tok, '^[^a-z0-9]+$$') THEN 1 ELSE 0 END) AS n_punct,
       |         COUNT(DISTINCT tok) AS n_distinct,
       |         SUM(len(tok)) AS n_tok_chars
       |  FROM t GROUP BY doc_id
       |), ff AS (
       |  SELECT CASE WHEN n_tokens < 20 THEN 1
       |              WHEN n_stop * 50 < n_tokens THEN 2
       |              WHEN n_punct * 10 > n_tokens * 3 THEN 3
       |              WHEN n_distinct * 10 < n_tokens * 3 THEN 4
       |              WHEN n_tok_chars < n_tokens * 2 OR n_tok_chars > n_tokens * 12 THEN 5
       |              ELSE 0 END AS first_fail
       |  FROM f
       |), c AS (
       |  SELECT COUNT(*) AS total,
       |         ${(1 to FunnelRules.size).map(k =>
      s"CAST(SUM(CASE WHEN first_fail = $k THEN 1 ELSE 0 END) AS BIGINT) AS d$k").mkString(", ")}
       |  FROM ff
       |)
       |SELECT * FROM (
       |  $armSql
       |) ORDER BY stage""".stripMargin
  }

  /** q134_score_rank_corr — DO MY QUALITY SIGNALS AGREE? Spearman and
    * Pearson correlation between two independent per-doc quality
    * signals: the q20 heuristic composite and the q72 unigram-LM
    * average log-probability. The meta-evaluation a curation run
    * performs before trusting either signal as a filter (FineWeb's
    * ablations correlate classifier scores against heuristics exactly
    * this way): high rank agreement → the cheap heuristic can gate for
    * the expensive model.
    *
    * Spearman = Pearson over FRACTIONAL MID-RANKS, and the ranks come
    * from the VALUE-GRID, not a corpus sort: both scores are 6-dp
    * rounded, so the distinct-value table is grid-bounded; its
    * cumulative count window (the one window here) runs over VALUE rows
    * — never corpus rows — and the rank map joins back broadcast.
    * Mid-ranks are exact k or k+0.5 doubles, so the rank moments are
    * integer-exact to 2^53 and both engines' correlation agrees at 6 dp
    * (the q124 moment-sum discipline; at corpus scales where n³ passes
    * 2^53 the last-ulp noise is ~1e-16 relative, far under the
    * rounding).
    *
    * 100 TB: two scored streams (each one corpus scan — production
    * persists score columns instead), a doc_id equi-join, two
    * value-scale rank maps broadcast back, ONE moment aggregate
    * (map-side combined). The only window is value-grid-scale.
    */
  def scoreRankCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val s1 = TextAnalysis.qualityScoreOf(docs).select(col("doc_id"), col("quality").as("s1"))
    val s2 = TextAnalysis.unigramLogProbOf(docs).select(col("doc_id"), col("avg_logp").as("s2"))
    scoreRankCorrOf(s1.join(s2, Seq("doc_id")))
  }

  /** Composable core for ANY (doc_id, s1, s2) scored frame. */
  def scoreRankCorrOf(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // value→mid-rank map via a DISTRIBUTED two-level prefix sum (the MPP
    // textbook shape — no global-order window anywhere): the cumulative
    // within a value BUCKET is a bucket-partitioned window; the bucket
    // OFFSETS fold in one bucket-scale aggregate (q109's sort_array+
    // collect_list idiom, with a lambda fold for the running sum). The
    // oracle computes the same exact numbers with one plain window — the
    // ranks are sums of exact integer counts, so the decomposition is
    // bit-transparent.
    def rankMap(c: String): DataFrame = {
      val vals = scored.groupBy(col(c)).agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("bk", floor(col(c) * 64).cast("long"))
      val wb = Window.partitionBy(col("bk")).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      val within = vals.withColumn("wcum", coalesce(sum(col("cnt")).over(wb), lit(0.0)))
      val offsets = vals.groupBy(col("bk")).agg(sum(col("cnt")).as("tot"))
        .agg(sort_array(collect_list(struct(col("bk"), col("tot")))).as("rows"))
        .select(explode(expr(
          """aggregate(
            |  rows,
            |  named_struct('cum', cast(0.0 as double),
            |               'out', cast(array() as array<struct<bk:bigint,off:double>>)),
            |  (acc, x) -> named_struct(
            |    'cum', acc.cum + x.tot,
            |    'out', concat(acc.out, array(named_struct('bk', x.bk, 'off', acc.cum))))
            |).out""".stripMargin)).as("r"))
        .select(col("r.bk").as("bk"), col("r.off").as("off"))
      within.join(broadcast(offsets), Seq("bk"))
        .select(col(c), (col("off") + col("wcum") + (col("cnt") + 1) / 2.0).as(s"r_$c"))
    }
    def pearson(a: Column, b: Column, n: Column,
                sa: Column, sb: Column, ssa: Column, ssb: Column, sab: Column): Column = {
      val num = n * sab - sa * sb
      val den = sqrt(n * ssa - sa * sa) * sqrt(n * ssb - sb * sb)
      round(when(den === 0, lit(null).cast("double")).otherwise(num / den), 6)
    }
    scored
      .join(broadcast(rankMap("s1")), Seq("s1"))
      .join(broadcast(rankMap("s2")), Seq("s2"))
      .agg(count(lit(1)).cast("double").as("nd"),
        sum(col("s1")).as("sa"), sum(col("s2")).as("sb"),
        sum(col("s1") * col("s1")).as("ssa"), sum(col("s2") * col("s2")).as("ssb"),
        sum(col("s1") * col("s2")).as("sab"),
        sum(col("r_s1")).as("ra"), sum(col("r_s2")).as("rb"),
        sum(col("r_s1") * col("r_s1")).as("rra"), sum(col("r_s2") * col("r_s2")).as("rrb"),
        sum(col("r_s1") * col("r_s2")).as("rab"))
      .select(col("nd").cast("long").as("n"),
        pearson(col("r_s1"), col("r_s2"), col("nd"),
          col("ra"), col("rb"), col("rra"), col("rrb"), col("rab")).as("spearman"),
        pearson(col("s1"), col("s2"), col("nd"),
          col("sa"), col("sb"), col("ssa"), col("ssb"), col("sab")).as("pearson"))
  }

  /** q143's anonymity floor and the n_chars bucket width. */
  val KAnonK = 5
  val KAnonBucket = 100

  /** q143_privacy_kanon — K-ANONYMITY AUDIT over quasi-identifiers: how
    * many (lang, source, length-bucket) equivalence classes have fewer
    * than [[KAnonK]] members, and what fraction of documents sit in
    * them — the re-identification exposure report (Sweeney '02) a
    * dataset release runs next to the PII scrub (q52 removes direct
    * identifiers; k-anonymity measures whether the INDIRECT ones —
    * metadata combinations — still single documents out). The length
    * bucket is integer division (n_chars div 100), so class membership
    * is exact on any engine.
    *
    * 100 TB: one (lang, source, bucket) count aggregate with map-side
    * combine (class-scale result), one 1-row reduce over the class
    * table. The corpus never shuffles text — only class-key partials.
    */
  def privacyKanon(spark: SparkSession, sfDir: String): DataFrame =
    privacyKanonOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (lang, source, n_chars, …) frame. */
  def privacyKanonOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("lang"), col("source"),
        expr(s"n_chars div $KAnonBucket").as("len_bucket"))
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cnt")).as("n_docs"),
        min(col("cnt")).as("min_class"),
        sum(when(col("cnt") < KAnonK, 1L).otherwise(0L)).as("small_classes"),
        sum(when(col("cnt") < KAnonK, col("cnt")).otherwise(lit(0L))).as("docs_small"))
      .select(col("n_classes"), col("n_docs"), col("min_class"),
        col("small_classes"), col("docs_small"),
        round(col("docs_small") / col("n_docs").cast("double"), 6).as("frac_exposed"))

  val q143OracleSql: String =
    s"""WITH cls AS (
       |  SELECT lang, source, n_chars // $KAnonBucket AS len_bucket, COUNT(*) AS cnt
       |  FROM documents GROUP BY 1, 2, 3
       |)
       |SELECT COUNT(*) AS n_classes,
       |       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       |       MIN(cnt) AS min_class,
       |       CAST(SUM(CASE WHEN cnt < $KAnonK THEN 1 ELSE 0 END) AS BIGINT) AS small_classes,
       |       CAST(SUM(CASE WHEN cnt < $KAnonK THEN cnt ELSE 0 END) AS BIGINT) AS docs_small,
       |       round(SUM(CASE WHEN cnt < $KAnonK THEN cnt ELSE 0 END) / CAST(SUM(cnt) AS DOUBLE), 6) AS frac_exposed
       |FROM cls""".stripMargin

  val q134OracleSql: String = {
    // the two scored streams are q20/q72's oracle derivations verbatim
    val stop = TextAnalysis.EnStopwords.map(s => s"'$s'").mkString("(", ",", ")")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS tok FROM documents
       |), g AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |         sum(CASE WHEN tok IN $stop THEN 1 ELSE 0 END) AS n_stop,
       |         sum(CASE WHEN regexp_matches(tok, '^[^a-z0-9]+$$') THEN 1 ELSE 0 END) AS n_punct
       |  FROM t GROUP BY doc_id
       |), q1 AS (
       |  SELECT doc_id,
       |         round(least(n_tokens / 100.0, 1.0) * 0.4
       |               + (1.0 - n_punct / CAST(n_tokens AS DOUBLE)) * 0.3
       |               + (n_stop / CAST(n_tokens AS DOUBLE)) * 0.3, 6) AS s1
       |  FROM g
       |), f AS (
       |  SELECT tok AS token, COUNT(*) AS freq FROM t GROUP BY tok
       |), tot AS (
       |  SELECT CAST(SUM(freq) AS DOUBLE) AS total FROM f
       |), q2 AS (
       |  SELECT doc_id, round(avg(ln(freq / total)), 6) AS s2
       |  FROM t JOIN f ON t.tok = f.token CROSS JOIN tot
       |  GROUP BY doc_id
       |), sc AS (
       |  SELECT q1.s1, q2.s2 FROM q1 JOIN q2 USING (doc_id)
       |), v1 AS (
       |  SELECT s1, CAST(COUNT(*) AS DOUBLE) AS cnt FROM sc GROUP BY s1
       |), r1 AS (
       |  SELECT s1, COALESCE(SUM(cnt) OVER (ORDER BY s1 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
       |           + (cnt + 1) / 2.0 AS r_s1
       |  FROM v1
       |), v2 AS (
       |  SELECT s2, CAST(COUNT(*) AS DOUBLE) AS cnt FROM sc GROUP BY s2
       |), r2 AS (
       |  SELECT s2, COALESCE(SUM(cnt) OVER (ORDER BY s2 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
       |           + (cnt + 1) / 2.0 AS r_s2
       |  FROM v2
       |), m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
       |         SUM(s1) AS sa, SUM(s2) AS sb,
       |         SUM(s1 * s1) AS ssa, SUM(s2 * s2) AS ssb, SUM(s1 * s2) AS sab,
       |         SUM(r_s1) AS ra, SUM(r_s2) AS rb,
       |         SUM(r_s1 * r_s1) AS rra, SUM(r_s2 * r_s2) AS rrb, SUM(r_s1 * r_s2) AS rab
       |  FROM sc JOIN r1 USING (s1) JOIN r2 USING (s2)
       |)
       |SELECT CAST(nd AS BIGINT) AS n,
       |       round((nd * rab - ra * rb) /
       |             nullif(sqrt(nd * rra - ra * ra) * sqrt(nd * rrb - rb * rb), 0), 6) AS spearman,
       |       round((nd * sab - sa * sb) /
       |             nullif(sqrt(nd * ssa - sa * sa) * sqrt(nd * ssb - sb * sb), 0), 6) AS pearson
       |FROM m""".stripMargin
  }

  val q126OracleSql: String =
    """SELECT rule, violations, total, violations = 0 AS pass FROM (
      |  SELECT 'li_discount_le_5pct' AS rule,
      |         CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |         COUNT(*) AS total FROM lineitem
      |  UNION ALL
      |  SELECT 'li_quantity_in_1_50',
      |         CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0) THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'li_tax_le_6pct',
      |         CAST(SUM(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'docs_nchars_consistent',
      |         CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM documents
      |  UNION ALL
      |  SELECT 'docs_text_nonempty',
      |         CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM documents
      |  UNION ALL
      |  SELECT 'events_ts_in_2024',
      |         CAST(SUM(CASE WHEN NOT (ts BETWEEN TIMESTAMP '2024-01-01 00:00:00'
      |                                        AND TIMESTAMP '2024-12-31 23:59:59.999999') THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM events
      |  UNION ALL
      |  SELECT 'events_value_nonneg',
      |         CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM events
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique',
      |         COUNT(*) - COUNT(DISTINCT o_orderkey),
      |         COUNT(*) FROM orders
      |  UNION ALL
      |  SELECT 'li_orderkey_fk',
      |         (SELECT COUNT(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |         (SELECT COUNT(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |         COUNT(*) FROM orders
      |) ORDER BY rule""".stripMargin
}
