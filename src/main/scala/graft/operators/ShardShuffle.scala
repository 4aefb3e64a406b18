package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic global TRAINING SHUFFLE into N output shards — the
  * data-loader prep step after curation: every doc gets a pseudo-random
  * but reproducible (shard, pos) so the training job streams shard files
  * in order and sees a fixed global permutation, with no RNG state to
  * checkpoint and bit-identical re-runs (the q06 split convention, applied
  * to ordering).
  *
  * The shuffle key is md5("shuffle:" || doc_id): shard = first-nibble
  * value (the [[DedupExtras]] simhash nibble-decode pattern, so the DuckDB
  * oracle computes the identical layout), pos = rank within the shard by
  * (key, doc_id).
  *
  * Scale: there is deliberately NO global ordering — a total-order
  * row_number is one reducer at any corpus size. Each shard's rank is a
  * per-shard window (the q69/q77 sharding argument): shard count is a
  * knob ∝ corpus size (shards ≈ corpus / target-file-size, so the
  * per-shard window is one output file's worth of rows — here N=16 for
  * the fixture). The production write path needs no window at all:
  * [[writeShards]] repartitions by shard and sorts WITHIN partitions —
  * shuffle + local sort, never a global one.
  */
object ShardShuffle {

  val NumShards = 16

  /** q81_shard_shuffle — (doc_id, shard, pos) for the fixture corpus. */
  def shardShuffle(spark: SparkSession, sfDir: String): DataFrame =
    shardShuffleOf(Tables.documents(spark, sfDir), NumShards)

  /** Shuffle-key + shard assignment, scan-local (no shuffle). `n` must
    * divide 16 so the nibble maps uniformly onto shards (16, 8, 4, 2).
    * `epoch` re-salts the key for multi-epoch training (each epoch streams
    * a DIFFERENT fixed permutation); epoch 0 keeps the bare "shuffle:"
    * prefix — the declared oracle layout.
    */
  private def keyed(docs: DataFrame, n: Int, epoch: Long): DataFrame = {
    require(16 % n == 0, s"shard count $n must divide 16 (one hex nibble)")
    val prefix = if (epoch == 0L) "shuffle:" else s"shuffle:$epoch:"
    docs
      .withColumn("skey", md5(concat(lit(prefix), col("doc_id"))))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', substr(skey, 1, 1)) - 1") % n).cast("long"))
  }

  /** Composable core for ANY (doc_id, …) frame: the deterministic
    * permutation as explicit (shard, pos) ranks. The window partitions by
    * shard (plan-pinned: hashpartitioning(shard), never a single
    * partition).
    */
  def shardShuffleOf(docs: DataFrame, n: Int, epoch: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    keyed(docs, n, epoch)
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** The production write path: one parquet directory per shard, rows
    * sorted by shuffle key WITHIN each shard — repartition + local sort,
    * no window, no global ordering anywhere. A training loader reading
    * shard directories in shard order and rows in file order replays
    * exactly the [[shardShuffleOf]] permutation.
    */
  def writeShards(docs: DataFrame, outDir: String, n: Int, epoch: Long = 0L): Unit =
    keyed(docs, n, epoch)
      .repartition(n, col("shard"))
      // shard leads the sort so the file writer's required ordering
      // (partition columns first) is already satisfied — otherwise
      // FileFormatWriter inserts its own non-stable sort on shard and
      // destroys the within-shard key order
      .sortWithinPartitions(col("shard"), col("skey"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** q141_shard_balance — the SHARD BALANCE audit of q81's assignment:
    * one report row with shard count, total rows, min/max shard sizes,
    * the max/min imbalance ratio, and the χ² uniformity statistic
    * Σ (nᵢ − E)²/E against E = total/[[NumShards]] — the check a
    * training-infra owner runs before trusting "16 equal shard files"
    * (a skewed shard = a straggler data-loader every epoch; χ² far
    * above ~N−1 means the hash is broken, not unlucky). Every term is
    * exact: counts are integers and E = total/16 is a dyadic rational
    * (16 = 2⁴), so (nᵢ−E)²/E sums identically in any order on any
    * engine — no rounding call needed on the statistic's inputs.
    *
    * 100 TB: the scan-local nibble assignment (no shuffle), one
    * 16-group count aggregate with map-side combine, one 1-row reduce.
    * The audit costs one pass regardless of corpus size.
    */
  def shardBalance(spark: SparkSession, sfDir: String): DataFrame =
    shardBalanceOf(Tables.documents(spark, sfDir), NumShards)

  /** Composable core for ANY (doc_id, …) frame. */
  def shardBalanceOf(docs: DataFrame, n: Int): DataFrame =
    keyed(docs, n, 0L)
      .groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_shards"),
        sum(col("cnt")).as("total"),
        min(col("cnt")).as("min_n"),
        max(col("cnt")).as("max_n"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .select(col("n_shards"), col("total"), col("min_n"), col("max_n"),
        round(col("max_n") / col("min_n").cast("double"), 6).as("imbalance"),
        // Σ(nᵢ−E)²/E = (Σnᵢ² − total²/N) / E with E = total/N — one pass
        round((col("ss") - col("total") * col("total") / lit(n.toDouble))
          / (col("total") / lit(n.toDouble)), 6).as("chi2"))

  val q141OracleSql: String =
    s"""WITH keyed AS (
       |  SELECT (strpos('0123456789abcdef', substring(md5('shuffle:' || doc_id), 1, 1)) - 1)
       |         % $NumShards AS shard
       |  FROM documents
       |), sc AS (
       |  SELECT shard, COUNT(*) AS cnt FROM keyed GROUP BY shard
       |), a AS (
       |  SELECT COUNT(*) AS n_shards, CAST(SUM(cnt) AS BIGINT) AS total,
       |         MIN(cnt) AS min_n, MAX(cnt) AS max_n,
       |         CAST(SUM(cnt * cnt) AS BIGINT) AS ss
       |  FROM sc
       |)
       |SELECT n_shards, total, min_n, max_n,
       |       round(max_n / CAST(min_n AS DOUBLE), 6) AS imbalance,
       |       round((ss - total * total / CAST($NumShards AS DOUBLE))
       |             / (total / CAST($NumShards AS DOUBLE)), 6) AS chi2
       |FROM a""".stripMargin

  val q81OracleSql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |         md5('shuffle:' || doc_id) AS skey
       |  FROM documents
       |)
       |SELECT doc_id,
       |       CAST((strpos('0123456789abcdef', substring(skey, 1, 1)) - 1)
       |            % $NumShards AS BIGINT) AS shard,
       |       CAST(row_number() OVER (
       |         PARTITION BY (strpos('0123456789abcdef', substring(skey, 1, 1)) - 1) % $NumShards
       |         ORDER BY skey, doc_id) AS BIGINT) AS pos
       |FROM keyed
       |ORDER BY doc_id""".stripMargin
}
