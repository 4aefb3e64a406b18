package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q166_consistent_hash_ring — CONSISTENT-HASHING shard assignment with
  * the elasticity audit: place every document on a 64-vnode-per-node md5
  * ring under N = 4 and N = 5 nodes and report, per node, the load
  * before/after and the keys GAINED by the expansion. The property the
  * ring exists for is the audit's payload: adding a node only STEALS
  * keys (a key moves iff one of the new node's vnodes lands between the
  * key and its old successor), so `gained` is 0 for every pre-existing
  * node and the moved mass ≈ 1/N — against naive `id % N` sharding,
  * where ~4/5 of all keys would reshuffle. This is the reference's own
  * scale-out story (a vector DB shards collections across nodes; resize
  * must not re-ingest the corpus) as a declared, hash-checked operator.
  *
  * 100 TB: the ring is CATALOG-scale (N × 64 positions) — both lookups
  * are a filter/element_at over a sorted LITERAL array, pure scan-local
  * per-row work, no join and no shuffle anywhere before the node-scale
  * aggregate. The successor scan is O(vnodes) per key at fixture vnode
  * counts; a 10k-vnode ring swaps in the q31 merge-and-carry (sort-based
  * successor) without changing semantics. Ring positions are md5-slice
  * integers (q154 discipline) computed from pinned constants — the
  * DuckDB oracle rebuilds the identical ring in SQL and resolves
  * successors with an ASOF join on the negated axis (largest −pos ≤ −key
  * ⟺ smallest pos ≥ key), wrap = global first vnode.
  */
object HashRing {

  val VnodesPerNode = 64
  val NodesBefore = 4
  val NodesAfter = 5

  /** 32-bit ring position of vnode v of node n — md5 of a pinned string,
    * mirrored verbatim in the oracle SQL.
    */
  private def vnodePos(n: Int, v: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ring:node$n:v$v".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Sorted (pos, node) ring for N nodes; positions are collision-free
    * for these pinned constants (required — a tie would make the
    * successor engine-order-dependent).
    */
  def ring(nodes: Int): Seq[(Long, Int)] = {
    val r = (for { n <- 0 until nodes; v <- 0 until VnodesPerNode }
      yield (vnodePos(n, v), n)).sortBy(_._1)
    require(r.map(_._1).distinct.size == r.size,
      s"vnode position collision in the pinned $nodes-node ring")
    r
  }

  /** Successor-node column for a 32-bit key-position column: first ring
    * slot at or after the key, wrapping to slot 0. A filter/count over a
    * sorted literal array — scan-local, codegen-reachable.
    */
  def assignCol(nodes: Int, keyPos: Column): Column = {
    val r = ring(nodes)
    // typedlit: ONE constant ArrayData, not a per-row 320-element
    // CreateArray (the array(lit…) form rebuilt the ring every row —
    // measured 5.4 s at sf0.1 vs sub-second with the constant)
    val posArr = typedlit(r.map(_._1))
    val nodeArr = typedlit(r.map(_._2.toLong))
    val idx = size(filter(posArr, p => p < keyPos)) // sorted: count(< key) = first index >= key
    element_at(nodeArr, when(idx === r.size, lit(1)).otherwise(idx + 1))
  }

  def consistentHashRing(spark: SparkSession, sfDir: String): DataFrame =
    consistentHashRingOf(Tables.documents(spark, sfDir).select(col("doc_id")))

  /** Composable core for ANY (doc_id) key frame. */
  def consistentHashRingOf(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    val keyPos = conv(substring(md5(concat(lit("key:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("long")
    // ONE corpus pass into the N×N transition grid (≤ 25 rows); every
    // report column derives from the grid — the naive three-aggregate
    // form re-ran the successor scan per aggregate (3× the work). The
    // grid is materialized to the DRIVER and replanted as a local
    // relation (the Hybrid.localized pattern): the corpus scan runs
    // exactly once, the three derivations read 25 in-memory rows, and
    // there is no cache-manager entry to leak (ADVICE r14; the earlier
    // .cache() was never unpersisted).
    val grid = Hybrid.localized(keys
      .select(col("doc_id"), keyPos.as("kp"))
      .select(
        assignCol(NodesBefore, col("kp")).as("a4"),
        assignCol(NodesAfter, col("kp")).as("a5"))
      .groupBy(col("a4"), col("a5")).agg(count(lit(1)).as("n")))
    val domain = broadcast(spark.range(NodesAfter).select(col("id").as("node")))
    val n4 = grid.groupBy(col("a4").as("node")).agg(sum(col("n")).as("n_keys4"))
    val n5 = grid.groupBy(col("a5").as("node")).agg(sum(col("n")).as("n_keys5"))
    val gained = grid.filter(col("a4") =!= col("a5"))
      .groupBy(col("a5").as("node")).agg(sum(col("n")).as("gained"))
    domain.join(n4, Seq("node"), "left").join(n5, Seq("node"), "left")
      .join(gained, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_keys4"), lit(0L)).as("n_keys4"),
        coalesce(col("n_keys5"), lit(0L)).as("n_keys5"),
        coalesce(col("gained"), lit(0L)).as("gained"))
      .orderBy(col("node"))
  }

  val q166OracleSql: String =
    s"""WITH vn AS (
       |  SELECT n.range AS node, v.range AS v,
       |         CAST(('0x' || substring(md5('ring:node' || n.range || ':v' || v.range), 1, 8))::UBIGINT AS BIGINT) AS pos
       |  FROM range($NodesAfter) n CROSS JOIN range($VnodesPerNode) v
       |), k AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substring(md5('key:' || doc_id), 1, 8))::UBIGINT AS BIGINT) AS kp
       |  FROM documents
       |), a4 AS (
       |  SELECT k.doc_id,
       |         coalesce(v.node,
       |           (SELECT node FROM vn WHERE node < $NodesBefore ORDER BY pos LIMIT 1)) AS node
       |  FROM k ASOF LEFT JOIN (
       |    SELECT -pos AS negpos, node FROM vn WHERE node < $NodesBefore) v
       |    ON -k.kp >= v.negpos
       |), a5 AS (
       |  SELECT k.doc_id,
       |         coalesce(v.node, (SELECT node FROM vn ORDER BY pos LIMIT 1)) AS node
       |  FROM k ASOF LEFT JOIN (SELECT -pos AS negpos, node FROM vn) v
       |    ON -k.kp >= v.negpos
       |), paired AS (
       |  SELECT a4.doc_id, a4.node AS n4, a5.node AS n5
       |  FROM a4 JOIN a5 USING (doc_id)
       |)
       |SELECT d.range AS node,
       |       CAST(coalesce(SUM(CASE WHEN p.n4 = d.range THEN 1 END), 0) AS BIGINT) AS n_keys4,
       |       CAST(coalesce(SUM(CASE WHEN p.n5 = d.range THEN 1 END), 0) AS BIGINT) AS n_keys5,
       |       CAST(coalesce(SUM(CASE WHEN p.n5 = d.range AND p.n4 <> p.n5 THEN 1 END), 0) AS BIGINT) AS gained
       |FROM range($NodesAfter) d LEFT JOIN paired p ON true
       |GROUP BY d.range ORDER BY node""".stripMargin
}
