package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal fixture generator (VERDICT r3 item 3): replicate the
  * driver's sf0.1 tables `copies`× with shifted keys so Bench can measure
  * an sf1-sized run and BASELINE.md can record the sf0.1→sf1 scaling
  * exponent per query. Pure derivation from the driver fixtures — this is
  * a PERFORMANCE corpus (row counts, key cardinalities, value
  * distributions scale realistically); correctness stays gated on the
  * driver's own sf0.01 via DuckDB.
  *
  * Design choices that keep scaling honest:
  *  - `documents.text` gets a per-replica affine letter substitution
  *    (period 312 — no replica aliases back to the original within 312
  *    copies): token frequencies and lengths are preserved (the vocab
  *    grows ~10×, freq distribution unchanged) while shingle sets across
  *    replicas are disjoint — exact and near-dup queries see 10× the
  *    corpus, NOT a quadratic blowup of artificial cross-replica
  *    duplicates.
  *  - `embeddings.embedding` is permuted per replica (rotations, then
  *    reversed rotations: period 2·dim; norm and component distribution
  *    preserved, cosine decorrelated), so k-NN and LSH see 10× genuinely
  *    distinct points, not 10 exact copies tying at similarity 1.0.
  *  - Fact-table keys shift by replica × (max key + 1); the `region`/
  *    `nation` dimensions stay fixed, as TPC-H scales them.
  *
  * Text modes (VERDICT r12 item 7). The affine substitution keeps
  * replica texts disjoint but grows the token VOCABULARY linearly with
  * copies — so gram/shingle/pair TYPE tables (q111/q112/q115/q118/q139)
  * measure a worst-case regime no real corpus exhibits (Heaps' law:
  * V ∝ n^β, β ≈ 0.5). Mode `heaps` measures the production regime
  * instead: replica r > 0 rewrites each document as a DETERMINISTIC
  * within-document token shuffle (sort by xxhash64(rep, doc_id, pos,
  * token)) — the corpus vocabulary is SHARED across replicas (unigram
  * types saturate, the Heaps asymptote), token and document-length
  * distributions are exactly preserved, and higher-order gram types
  * grow only through recombination of known tokens, as fresh text drawn
  * from a fixed vocabulary does. SHORT documents DO repeat across
  * replicas (a t-token doc has at most t! orderings, fewer with repeated
  * tokens — by pigeonhole any doc of ≤3 distinct-orderable tokens
  * collides somewhere within 10 copies), so heaps-mode exact-dedup
  * counts are inflated relative to affine mode: exact-dedup queries
  * (q15/q45) should be laddered on AFFINE fixtures (FIXTURES.md;
  * ADVICE r13). Mode `affine` (default) remains the dedup-family
  * fixture: disjoint shingle sets are exactly what near-dup queries
  * need to avoid a quadratic blowup of artificial cross-replica
  * duplicates.
  *
  * Usage: GenScale <inDir> <outDir> [copies=10] [mode=affine|heaps]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val in     = args(0)
    val out    = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val mode   = if (args.length > 3) args(3) else "affine"
    val spark = MainSupport.localSession("spark.sql.legacy.parquet.nanosAsLong" -> "true")
    run(spark, in, out, copies, mode)
    spark.stop()
  }

  /** The generator body, separated from `main`'s session lifecycle so the
    * replica-disjointness guarantees are spec-testable on a live session.
    */
  def run(spark: SparkSession, in: String, out: String, copies: Int,
          mode: String = "affine"): Unit = {
    require(mode == "affine" || mode == "heaps", s"GenScale: unknown mode '$mode'")
    def tbl(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    /** Cross-join each row with replica ids 0..copies-1. */
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0), lit(copies - 1))))
    def keyOffset(df: DataFrame, keyCol: String): Long =
      df.agg(max(col(keyCol))).head().getLong(0) + 1L

    // BOTH alias guards fire BEFORE any write: failing after the (large)
    // documents write would leave the out dir holding fresh documents next
    // to stale-or-missing embeddings — a silently mixed-scale dataset.
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    require(mode == "heaps" || copies <= coprimes.size * 26,
      s"GenScale: copies=$copies exceeds the affine substitution period ${coprimes.size * 26} — " +
        "replicas would alias and create exact cross-replica duplicate texts")
    require(copies >= 1, s"GenScale: copies=$copies must be >= 1")
    val emb = tbl("embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // the rotation/reversed-rotation group has 2·dim DISTINCT non-identity-
    // free elements only for dim >= 3 (dim 2: reversal == rotation-by-1,
    // so rep 3 is the identity; dim 1: every permutation is the identity)
    require(dim >= 3,
      s"GenScale: embedding dim $dim < 3 — the permutation family degenerates and replicas would alias")
    require(copies <= 2 * dim,
      s"GenScale: copies=$copies exceeds the $dim-dim permutation period ${2 * dim} — " +
        "replicas would alias and create exact cross-replica duplicate vectors")

    // dimensions stay fixed
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    // documents: shifted ids, affine-substituted text per replica.
    // Affine cipher c -> a*c + b (mod 26) with a coprime to 26: 12×26 = 312
    // distinct substitutions, identity ONLY at rep = 0 — a plain Caesar
    // shift cycles at 26 replicas, silently aliasing replica 26 back onto
    // the original text and manufacturing exactly the artificial
    // cross-replica duplicates this generator exists to avoid (ADVICE r4).
    val docs = tbl("documents")
    val dOff = keyOffset(docs, "doc_id")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // built ONLY in affine mode: coprimes(r / 26) is defined for r < 312,
    // which the affine-mode require above guarantees — heaps mode supports
    // copies > 312 and must not construct this Seq at all (ADVICE r13)
    def substituted: org.apache.spark.sql.Column = {
      val affine = (0 until copies).map { r =>
        val a = coprimes(r / 26)
        val b = r % 26
        val lower = (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
        (r, alpha + alpha.toUpperCase, lower + lower.toUpperCase)
      }
      affine.foldLeft(lit(null).cast("string")) { case (acc, (r, from, to)) =>
        when(col("rep") === r, translate(col("text"), from, to)).otherwise(acc)
      }
    }
    // heaps mode: scan-local deterministic within-doc token shuffle —
    // sort (hash, token) structs, rejoin. Vocabulary shared across
    // replicas; token/length distributions preserved; n_chars recomputed
    // (single-space joining changes the character count).
    val shuffled = when(col("rep") === 0, col("text")).otherwise(
      array_join(
        transform(
          array_sort(
            transform(graft.operators.TextPipeline.tokenArr(col("text")), (t, i) =>
              struct(xxhash64(col("rep"), col("doc_id"), i, t).as("k"), t.as("t")))),
          s => s.getField("t")),
        " "))
    val (newText, newChars) =
      if (mode == "heaps") (shuffled, length(shuffled).cast("long"))
      else (substituted, col("n_chars"))
    write(replicate(docs)
      .select((col("doc_id") + col("rep") * dOff).as("doc_id"),
        newText.as("text"), col("lang"), col("source"), newChars.as("n_chars")), "documents")

    // embeddings: shifted ids, permuted vectors per replica. The permutation
    // group is rotations (rep < dim) then REVERSED rotations (rep >= dim) —
    // 2·dim distinct permutations, identity only at rep = 0. The previous
    // stride-7 rotation hit rotation 0 whenever dim divided rep*7 (dim=64,
    // rep=64 under an sf10-scale run), making replica `dim` an exact copy
    // of replica 0 (ADVICE r4). Norms and component distributions are
    // preserved either way; cosine is decorrelated across replicas.
    val eOff = keyOffset(emb, "vec_id")
    val rot  = pmod(col("rep"), lit(dim))
    val rotated = concat(slice(col("embedding"), rot + 1, lit(dim) - rot),
      slice(col("embedding"), lit(1), rot))
    val permuted = when(col("rep") >= dim, reverse(rotated)).otherwise(rotated)
    write(replicate(emb)
      .select((col("vec_id") + col("rep") * eOff).as("vec_id"),
        permuted.as("embedding"),
        col("label")), "embeddings")

    // events: shifted event/user ids, same time range (10x the traffic)
    val ev   = tbl("events")
    val evOff = keyOffset(ev, "event_id")
    val uOff  = keyOffset(ev, "user_id")
    write(replicate(ev)
      .select((col("event_id") + col("rep") * evOff).as("event_id"), col("ts"),
        (col("user_id") + col("rep") * uOff).as("user_id"),
        col("event_type"), col("value"), col("props")), "events")

    // star schema: every foreign key shifts by the SAME per-table offset
    val cust = tbl("customer"); val cOff = keyOffset(cust, "c_custkey")
    val supp = tbl("supplier"); val sOff = keyOffset(supp, "s_suppkey")
    val part = tbl("part");     val pOff = keyOffset(part, "p_partkey")
    val ord  = tbl("orders");   val oOff = keyOffset(ord, "o_orderkey")
    write(replicate(cust)
      .select((col("c_custkey") + col("rep") * cOff).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    write(replicate(supp)
      .select((col("s_suppkey") + col("rep") * sOff).as("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal")), "supplier")
    write(replicate(part)
      .select((col("p_partkey") + col("rep") * pOff).as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")), "part")
    write(replicate(ord)
      .select((col("o_orderkey") + col("rep") * oOff).as("o_orderkey"),
        (col("o_custkey") + col("rep") * cOff).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), "orders")
    write(replicate(tbl("lineitem"))
      .select((col("l_orderkey") + col("rep") * oOff).as("l_orderkey"),
        (col("l_partkey") + col("rep") * pOff).as("l_partkey"),
        (col("l_suppkey") + col("rep") * sOff).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate")), "lineitem")

    println(s"GenScale: wrote ${copies}x $in -> $out")
  }
}
