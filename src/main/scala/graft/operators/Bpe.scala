package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextPipeline.tokenArr

/** BPE tokenizer TRAINING on the cluster. The whole inner loop of
  * byte-pair encoding (Sennrich et al., ACL 2016) is one aggregation:
  * count adjacent symbol pairs over the corpus, take the most frequent,
  * merge it, repeat. The count is corpus-scale and belongs on the
  * cluster; the merge decision is one row. The engine therefore exposes:
  *
  *   - [[bpePairCounts]] (q84, oracle-declared): the pair-count
  *     aggregation over character symbols — scan-local pair assembly
  *     (each token's char array zips with its own tail, the q78 trick at
  *     character level; no window, no self-join), map-side-combined count
  *     on a key space bounded by the symbol alphabet², and a
  *     TakeOrderedAndProject top-50.
  *   - [[bpeTrainOf]] (non-declared, spec-verified against a reference
  *     implementation): the full iterative loop — N rounds of
  *     count → argmax → scan-local merge. Each round is ONE corpus pass
  *     whose shuffle carries only (pair, count) partials; the argmax is a
  *     1-row driver decision, exactly the artifact-scale driver work the
  *     q54 pattern allows. Symbol merging is a higher-order `aggregate`
  *     over the array — no UDF, no explode-regroup round trip.
  *
  * At 100 TB: pair counting is the same map-side-combine shape as q04's
  * vocab build (the shuffle is alphabet-squared, not corpus-sized) and a
  * production run counts over q82's deterministic sample instead of the
  * full corpus — tokenizer training needs frequency RANKS, not exact
  * counts, and the sample bound makes the N-round loop's total cost
  * independent of corpus size.
  */
object Bpe {

  val PairTopK = 50

  /** Character symbols of each token instance (length ≥ 2), as an array. */
  private def charArrays(docs: DataFrame): DataFrame =
    docs
      .select(explode(tokenArr(col("text"))).as("token"))
      .filter(length(col("token")) >= 2)
      .select(expr("regexp_extract_all(token, '(.)', 1)").as("cs"))

  /** Adjacent-pair counts (c1, c2, n) of a symbol-array frame. */
  private def pairCounts(symbols: DataFrame): DataFrame =
    symbols
      .select(explode(arrays_zip(
        slice(col("cs"), lit(1), size(col("cs")) - 1).as("c1"),
        slice(col("cs"), lit(2), size(col("cs")) - 1).as("c2"))).as("p"))
      .select(col("p.c1").as("c1"), col("p.c2").as("c2"))
      .groupBy(col("c1"), col("c2"))
      .agg(count(lit(1)).as("n"))

  /** q84_bpe_pair_counts — top-50 adjacent character pairs by
    * (count desc, c1 asc, c2 asc) over the fixture corpus.
    */
  def bpePairCounts(spark: SparkSession, sfDir: String): DataFrame =
    bpePairCountsOf(Tables.documents(spark, sfDir))

  /** Composable core of q84 for ANY (doc_id, text, …) corpus. */
  def bpePairCountsOf(docs: DataFrame): DataFrame =
    pairCounts(charArrays(docs))
      .orderBy(col("n").desc, col("c1"), col("c2"))
      .limit(PairTopK)

  val q84OracleSql: String =
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token FROM documents
       |), c AS (
       |  SELECT regexp_extract_all(token, '(.)', 1) AS cs FROM t WHERE length(token) >= 2
       |), p AS (
       |  SELECT cs[g.i] AS c1, cs[g.i+1] AS c2
       |  FROM c CROSS JOIN UNNEST(generate_series(1, len(cs)-1)) AS g(i)
       |)
       |SELECT c1, c2, CAST(COUNT(*) AS BIGINT) AS n
       |FROM p GROUP BY c1, c2
       |ORDER BY n DESC, c1, c2
       |LIMIT $PairTopK""".stripMargin

  /** Scan-local simultaneous merge of ONE pair (a, b) → ab everywhere in
    * a symbol array, greedy left-to-right on runs ("aaa" under (a,a) →
    * ["aa","a"]): a single `aggregate` HOF folds the array carrying a
    * one-symbol lookahead in `pending`; the finish lambda flushes it.
    * The '' sentinel is safe: symbols are non-empty chars or their
    * concatenations.
    */
  /** Spark-SQL string literal (backslash-escaped). */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private def mergePairExpr(a: String, b: String): String = {
    val (qa, qb, qab) = (sqlLit(a), sqlLit(b), sqlLit(a + b))
    s"""aggregate(cs,
       |  named_struct('done', cast(array() as array<string>), 'pending', ''),
       |  (acc, x) -> CASE
       |    WHEN acc.pending = '' THEN named_struct('done', acc.done, 'pending', x)
       |    WHEN acc.pending = $qa AND x = $qb
       |      THEN named_struct('done', concat(acc.done, array($qab)), 'pending', '')
       |    ELSE named_struct('done', concat(acc.done, array(acc.pending)), 'pending', x)
       |  END,
       |  acc -> filter(concat(acc.done, array(acc.pending)), s -> s <> ''))""".stripMargin
  }

  /** Full BPE training loop: `merges` rounds of count → argmax → merge
    * over the corpus' token-instance symbol sequences. Returns the merge
    * table (rank, c1, c2, n) — the artifact a tokenizer ships (q54's
    * persisted-vocab pattern is the storage side). Each round
    * materializes the merged symbol column (localCheckpoint) so round
    * k+1 scans packed arrays, not a k-deep expression tree.
    */
  def bpeTrainOf(docs: DataFrame, merges: Int): Seq[(Int, String, String, Long)] = {
    var symbols = charArrays(docs).localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (rank <- 1 to merges) {
        val top = pairCounts(symbols)
          .orderBy(col("n").desc, col("c1"), col("c2"))
          .limit(1).collect()
        if (top.isEmpty) return out.toSeq
        val (c1, c2, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((rank, c1, c2, n))
        val next = symbols.select(expr(mergePairExpr(c1, c2)).as("cs")).localCheckpoint(true)
        symbols.unpersist()
        symbols = next
      }
      out.toSeq
    } finally symbols.unpersist()
  }
}
