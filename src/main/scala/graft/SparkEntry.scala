package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching `oracleSql` entry (DuckDB SQL over
  * the same parquet fixtures, table names = file basenames) unless noted;
  * column names and types are aligned between the two sides because the
  * driver's compare sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Knn.knnTopkCosine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2B. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_knn_topk_cosine"  -> ((s, dir) => Knn.knnTopkCosine(s, dir)),
    "q02_knn_top1_filtered" -> ((s, dir) => Knn.knnTop1Filtered(s, dir)),
  )

  /** DuckDB-runnable oracle SQL per query key. */
  def oracleSql: Map[String, String] = Map(
    "q01_knn_topk_cosine"  -> Knn.q01OracleSql,
    "q02_knn_top1_filtered" -> Knn.q02OracleSql,
  )
}
