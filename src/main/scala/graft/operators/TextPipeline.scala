package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text/training data-preparation operators derived from the reference's
  * transformer scripts: word-level vocab build with min frequency
  * (reference: transformer_sample.py:398-407), fixed-length encode with
  * SOS/EOS/PAD framing and too-long rejection
  * (reference: transformer_sample.py:510-541), deterministic train/val split
  * (reference: transformer_sample.py:431-433), per-language length stats
  * (reference: transformer_sample.py:442-448), `[INST]…[/INST]` instruction
  * parsing (reference: transformer_training.py:300-301), and per-document
  * text statistics (north-star text-analysis addition).
  */
object TextPipeline {

  /** Special token ids, mirroring the reference's `[UNK],[PAD],[SOS],[EOS]`
    * convention (reference: transformer_sample.py:402-404 special tokens).
    */
  val UnkId = 0L; val PadId = 1L; val SosId = 2L; val EosId = 3L

  /** Fixed sequence length for q05 (reference uses seq_len=350,
    * transformer_sample.py:652; fixtures have 10-99 tokens/doc so 64 both
    * keeps and drops documents, exercising the too-long rejection path).
    */
  val SeqLen = 64

  /** HF `Whitespace` pre-tokenizer fidelity: words and punctuation runs are
    * separate tokens — `\w+|[^\w\s]+`, not a plain whitespace split
    * (SURVEY.md §7 risk note).
    */
  def tokenArr(c: Column): Column =
    regexp_extract_all(c, lit("(\\w+|[^\\w\\s]+)"), lit(1))

  /** Corpus vocab (token, id, freq): freq >= 2, ids assigned 4.. by
    * (freq desc, token asc).
    *
    * Id assignment is a two-phase rank (VERDICT r1 item 4): rank within
    * each frequency bucket with a PARTITIONED window (no
    * single-partition WindowExec — a web-scale corpus at min-freq 2 has
    * 10⁸–10⁹ vocab tokens, far too many for one executor), then add the
    * token count of all strictly-higher-frequency buckets, computed with
    * a broadcast non-equi self-join over the per-frequency counts (a
    * table with one row per DISTINCT frequency value — heavy-tailed, so
    * thousands of rows at any corpus size). Equivalent to
    * `row_number() OVER (ORDER BY freq DESC, token)` with no global sort.
    * Residual skew: the min-freq bucket is the largest; if it ever
    * outgrows an executor, sub-bucket by token range with per-range
    * offsets (same two-phase pattern, one more level).
    */
  /** CONSTRUCTION-EAGERNESS CONVENTION (one rule, engine-wide): library
    * builders like this one are LAZY — calling them constructs a plan and
    * runs NO Spark job, so Explain/plan-only callers stay job-free. The
    * eager, materialized path is the explicit artifact surface:
    * [[fitVocab]] (one-shot fit), [[sharedVocab]] (session-scoped
    * fit-once memo — what every declared query uses), and
    * [[saveVocab]]/[[loadVocab]] (cross-session persistence, the
    * reference's tokenizer_en.json). A lazy vocab reused in two plan
    * branches recomputes its aggregation per branch — reuse goes through
    * the eager surface, by design.
    */
  def corpusVocab(docs: DataFrame): DataFrame = {
    val toks  = docs.select(explode(tokenArr(col("text"))).as("token"))
    val freqs = toks.groupBy("token").agg(count(lit(1)).as("freq")).filter(col("freq") >= 2)
    corpusVocabFrom(freqs)
  }

  /** Fit the vocab EAGERLY: the (token, freq) table is cached and counted
    * (the two-phase rank consumes it twice — bucket counts and in-bucket
    * rank — and a lazy cache would let the branches race and recompute the
    * tokenize+count subtree), and the result is materialized via eager
    * localCheckpoint so its blocks live on executors and are released by
    * the context cleaner when the caller drops the frame — nothing lands
    * in the session CacheManager (VERDICT r2 item 4). On a cluster with
    * dynamic allocation prefer [[saveVocab]]/[[loadVocab]] —
    * localCheckpoint blocks die with their executor.
    */
  def fitVocab(docs: DataFrame): DataFrame = {
    val toks  = docs.select(explode(tokenArr(col("text"))).as("token"))
    val freqs = toks.groupBy("token").agg(count(lit(1)).as("freq")).filter(col("freq") >= 2).cache()
    try {
      freqs.count()
      corpusVocabFrom(freqs).localCheckpoint(true)
    } finally freqs.unpersist()
  }

  // Keyed on the SESSION OBJECT by reference equality (no hash-collision
  // cross-talk between sessions), with eviction of STOPPED sessions swept
  // lazily on every access. NOT a WeakHashMap: the memoized DataFrames
  // strongly reference their session (Dataset.sparkSession), so weak keys
  // could never be collected while their values were held — the classic
  // value-refers-to-key pitfall. Stop-based eviction is the signal that
  // actually fires; sessions are few, so the linear eq-scan is free.
  // Live sessions abandoned WITHOUT stop() keep their entry until
  // [[clearVocabMemo]] or context stop — documented, not leak-free-magic.
  private val vocabMemo = scala.collection.mutable.ArrayBuffer[
    (SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame])]()

  /** Session-scoped fit-once/encode-many vocab: one [[fitVocab]] per
    * (session, corpus dir), memoized — the engine-side rendering of the
    * reference's build-or-load tokenizer (transformer_sample.py:427-428
    * loads tokenizer_en.json when present instead of refitting). q04, q05,
    * q33 and q47 all draw from this one fit, so a bench/pipeline run pays
    * the vocab fit ONCE, not once per query. Sound because the fixture
    * corpus is immutable for a given dir; a caller that mutates a corpus
    * in place must [[clearVocabMemo]] (or persist explicit artifacts via
    * [[saveVocab]] and version the path, the 100 TB practice).
    */
  def sharedVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val perSession = vocabMemo.synchronized {
      // sweep: drop entries whose session's context has stopped — their
      // localCheckpoint blocks are gone with the executors anyway, and
      // retaining the DataFrames would pin the stopped session for the
      // JVM lifetime (ADVICE r4 item 1)
      vocabMemo.filterInPlace { case (s, _) => !s.sparkContext.isStopped }
      vocabMemo.find(_._1 eq spark).map(_._2).getOrElse {
        val m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        vocabMemo += ((spark, m))
        m
      }
    }
    // getOrElseUpdate may fit twice under a rare race — both fits are
    // identical and one wins; correctness is unaffected
    perSession.getOrElseUpdate(sfDir, fitVocab(Tables.documents(spark, sfDir)))
  }

  /** Drop every memoized vocab (tests; corpus-mutating callers). */
  def clearVocabMemo(): Unit = vocabMemo.synchronized(vocabMemo.clear())

  /** The two-phase id assignment over a materialized (token, freq) table. */
  private def corpusVocabFrom(freqs: DataFrame): DataFrame = {
    val bucketN = freqs.groupBy(col("freq")).agg(count(lit(1)).as("bucket_n"))
    // Cumulative offsets over the per-frequency counts — one row per
    // DISTINCT frequency value (heavy-tailed, thousands at any corpus
    // size), computed with a broadcast non-equi self-join rather than an
    // unpartitioned running-sum window, which would re-introduce the
    // single-partition WindowExec this rewrite removes.
    val offsets = bucketN.as("a")
      .join(
        broadcast(bucketN.select(col("freq").as("hfreq"), col("bucket_n").as("hn"))),
        col("hfreq") > col("a.freq"), "left")
      .groupBy(col("a.freq"))
      .agg(coalesce(sum(col("hn")), lit(0L)).as("offset"))
    val wb = Window.partitionBy(col("freq")).orderBy(col("token").asc)
    freqs
      .withColumn("r", row_number().over(wb))
      .join(broadcast(offsets), Seq("freq"))
      .withColumn("id", (col("r") + col("offset") + lit(3L)).cast("long"))
      .select(col("token"), col("id"), col("freq"))
  }

  /** q04_vocab_build_minfreq — specials first (ids 0-3, freq 0), then corpus
    * tokens by (freq desc, token asc).
    */
  def vocabBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val specials = Seq(("[UNK]", UnkId, 0L), ("[PAD]", PadId, 0L), ("[SOS]", SosId, 0L), ("[EOS]", EosId, 0L))
      .toDF("token", "id", "freq")
    specials
      .unionByName(sharedVocab(spark, sfDir).select(col("token"), col("id"), col("freq")))
      .orderBy(col("id"))
  }

  /** The reference's raw dataset rows are NESTED translation structs —
    * `{"translation": {"en": …, "it": …}}` (reference:
    * text_vector_db.py:26-29, transformer_sample.py:494-495, the
    * opus_books shape) — while the engine's corpus operators take flat
    * (doc_id, lang, text). This is the bridge: one output row per
    * (doc, lang) via a scan-local `stack` over the struct's fields — a
    * generator projection, no shuffle, and the struct field reads are
    * column-pruned at the scan (only `translation.en`/`.it` are read,
    * never the whole row). Null/missing translations drop out, matching
    * the reference's per-pair iteration.
    */
  def flattenTranslations(rows: DataFrame, langs: Seq[String]): DataFrame = {
    require(langs.nonEmpty, "flattenTranslations: at least one language")
    val stackArgs = langs.map(l => s"'$l', translation.`$l`").mkString(", ")
    rows
      .selectExpr("doc_id", s"stack(${langs.length}, $stackArgs) AS (lang, text)")
      .filter(col("text").isNotNull)
  }

  /** Tokenizer-artifact persistence (S8): the reference saves/loads its
    * vocab as JSON (reference: transformer_sample.py:395-411,
    * tokenizer_en.json) so a trained tokenizer is reusable across runs.
    * JSON-lines keeps the artifact human-diffable like the reference's;
    * one file per vocab shard, schema (token, id, freq).
    */
  def saveVocab(vocab: DataFrame, path: String): Unit =
    vocab.write.mode("overwrite").json(path)

  /** Read a persisted vocab artifact back with its exact schema (long ids
    * and freqs, as [[vocabBuild]] emits).
    */
  def loadVocab(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("token STRING, id BIGINT, freq BIGINT")
      .json(path)
      .select(col("token"), col("id"), col("freq"))

  val q04OracleSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1)) AS token FROM documents
      |), freqs AS (
      |  SELECT token, COUNT(*) AS freq FROM toks GROUP BY token HAVING COUNT(*) >= 2
      |), corpus AS (
      |  SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) + 3 AS BIGINT) AS id,
      |         CAST(freq AS BIGINT) AS freq
      |  FROM freqs
      |), specials AS (
      |  SELECT token, CAST(id AS BIGINT) AS id, CAST(0 AS BIGINT) AS freq
      |  FROM (VALUES ('[UNK]', 0), ('[PAD]', 1), ('[SOS]', 2), ('[EOS]', 3)) AS t(token, id)
      |)
      |SELECT token, id, freq FROM specials
      |UNION ALL
      |SELECT token, id, freq FROM corpus
      |ORDER BY id""".stripMargin

  /** q05_tokenize_pad — encode each doc to a fixed-length id sequence:
    * [SOS] + token ids (UNK for OOV) + [EOS], padded with [PAD] to SeqLen;
    * documents longer than SeqLen-2 tokens are dropped
    * (reference: transformer_sample.py:510-541).
    *
    * The vocab side is broadcast (dictionary-sized); the token explode keeps
    * the heavy side shuffle-free until the per-doc regroup.
    */
  def tokenizePad(spark: SparkSession, sfDir: String): DataFrame =
    encodeWith(Tables.documents(spark, sfDir), sharedVocab(spark, sfDir))

  /** The encode body of [[tokenizePad]] against a caller-supplied vocab —
    * factored out so encode and [[decode]] can share ONE vocab build
    * (q47), and so a persisted vocab ([[loadVocab]]) can encode new
    * corpora without refitting.
    */
  def encodeWith(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("token"), col("id"))
    val toksPos = docs
      .select(col("doc_id"), posexplode(tokenArr(col("text"))))
      .toDF("doc_id", "pos", "token")
    val joined = toksPos
      .join(broadcast(v), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(UnkId)))
    val seqs = joined
      .groupBy("doc_id")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("id")))), s => s.getField("id"))
          .as("ids"))
    seqs
      .filter(size(col("ids")) <= SeqLen - 2)
      .select(
        col("doc_id"),
        concat(
          array(lit(SosId)),
          col("ids"),
          array(lit(EosId)),
          array_repeat(lit(PadId), lit(SeqLen) - size(col("ids")) - 2)
        ).as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** Driver-hashable q05 projection: the driver's pandas compare cannot sort
    * ndarray cells (VERDICT r1 item 1), so the declared query serializes the
    * id sequence with a space join; the array-typed API stays `tokenizePad`.
    */
  def tokenizePadDeclared(spark: SparkSession, sfDir: String): DataFrame =
    tokenizePad(spark, sfDir)
      .select(col("doc_id"), array_join(col("token_ids"), " ").as("token_ids"))
      .orderBy(col("doc_id"))

  val q05OracleSql: String =
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
       |)
       |SELECT doc_id,
       |       array_to_string([CAST(2 AS BIGINT)] || ids || [CAST(3 AS BIGINT)]
       |         || list_transform(range(${SeqLen} - 2 - len(ids)), x -> CAST(1 AS BIGINT)), ' ') AS token_ids
       |FROM seqs
       |WHERE len(ids) <= ${SeqLen} - 2
       |ORDER BY doc_id""".stripMargin

  /** Detokenizer — ids → text, the inverse of [[encodeWith]] (reference:
    * `tokenizer.decode`, transformer_sample.py:623-624). Framing and
    * padding ids (SOS/EOS/PAD) are stripped; any id absent from the vocab
    * (UNK included — specials are not in the corpus vocab) renders as
    * `[UNK]`. The vocab side is broadcast (dictionary-sized); the id
    * explode keeps the heavy side shuffle-free until the per-doc regroup —
    * the mirror of the encode plan.
    *
    * `encoded` must have (doc_id, token_ids: array<long>).
    */
  def decode(encoded: DataFrame, vocab: DataFrame): DataFrame =
    encoded
      .select(col("doc_id"), posexplode(col("token_ids")))
      .toDF("doc_id", "pos", "id")
      .filter(!col("id").isin(PadId, SosId, EosId))
      .join(broadcast(vocab.select(col("id"), col("token"))), Seq("id"), "left")
      .withColumn("tok", coalesce(col("token"), lit("[UNK]")))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))), s => s.getField("tok")),
        " ").as("decoded_text"))

  /** q47_detokenize — encode each document with [[encodeWith]] and decode
    * the padded id sequences back to text through the SAME vocab. In-vocab
    * tokens round-trip exactly; OOV tokens surface as `[UNK]` — the
    * reference's decode output for an untrained word, made oracle-checkable.
    */
  def detokenize(spark: SparkSession, sfDir: String): DataFrame = {
    val docs  = Tables.documents(spark, sfDir)
    val vocab = sharedVocab(spark, sfDir)
    decode(encodeWith(docs, vocab), vocab)
      .orderBy(col("doc_id"))
  }

  /** q54_encode_persisted_vocab — the full fit-once/encode-many artifact
    * loop, declared: the session's fitted vocab is persisted with
    * [[saveVocab]] (the reference's tokenizer_en.json artifact,
    * transformer_sample.py:395-411), read back with [[loadVocab]], and the
    * corpus is encoded through the LOADED artifact. A hash match against
    * the q05 oracle proves the persisted artifact loses nothing — encode
    * via the artifact is bit-identical to encode via the live fit.
    */
  def encodePersistedVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val vocabDir = java.nio.file.Files.createTempDirectory("graft_vocab_artifact").toString
    saveVocab(sharedVocab(spark, sfDir), vocabDir)
    encodeWith(Tables.documents(spark, sfDir), loadVocab(spark, vocabDir))
      .select(col("doc_id"), array_join(col("token_ids"), " ").as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** Same computation as q05 through the artifact path — same oracle. */
  val q54OracleSql: String = q05OracleSql

  val q47OracleSql: String =
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
       |), kept AS (
       |  SELECT doc_id, ids FROM seqs WHERE len(ids) <= ${SeqLen} - 2
       |), ex AS (
       |  SELECT doc_id, generate_subscripts(ids, 1) AS pos, unnest(ids) AS id FROM kept
       |), dec AS (
       |  SELECT e.doc_id, e.pos, COALESCE(v.token, '[UNK]') AS token
       |  FROM ex e LEFT JOIN vocab v USING (id)
       |)
       |SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS decoded_text
       |FROM dec GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q06_split_train_val — deterministic 90/10 split, validation side
    * (reference: transformer_sample.py:431-433 random_split, made
    * reproducible via id arithmetic; Spark hash() differs from DuckDB's, so
    * plain modulus is the cross-engine-checkable form).
    */
  def splitTrainVal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 9)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val q06OracleSql: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % 10 = 9 ORDER BY doc_id"

  /** q07_maxlen_by_lang — max/avg token count and doc count per language
    * (reference: transformer_sample.py:442-448 max-length scan).
    */
  def maxlenByLang(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), size(tokenArr(col("text"))).as("n_tok"))
      .groupBy(col("lang"))
      .agg(
        max(col("n_tok")).cast("long").as("max_len"),
        round(avg(col("n_tok")), 6).as("avg_len"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))

  val q07OracleSql: String =
    """SELECT lang,
      |       CAST(max(len(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1))) AS BIGINT) AS max_len,
      |       round(avg(len(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1))), 6) AS avg_len,
      |       COUNT(*) AS n_docs
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** q08_instruction_parse — extract instruction/response from
    * `[INST] … [/INST] …` framed text (reference:
    * transformer_training.py:300-301). The fixture corpus has no markers, so
    * the query derives a framed column from `text` first, then parses it
    * back out with the reference's split semantics.
    */
  def instructionParse(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn(
        "framed",
        concat(lit("[INST] "), substring(col("text"), 1, 40), lit(" [/INST] "), substring(col("text"), 41, 60)))
      .select(
        col("doc_id"),
        trim(regexp_extract(col("framed"), "\\[INST\\](.*?)\\[/INST\\]", 1)).as("instruction"),
        trim(regexp_extract(col("framed"), "\\[/INST\\](.*)$", 1)).as("response"))
      .orderBy(col("doc_id"))

  val q08OracleSql: String =
    """WITH framed AS (
      |  SELECT doc_id,
      |         '[INST] ' || substring(text, 1, 40) || ' [/INST] ' || substring(text, 41, 60) AS framed
      |  FROM documents
      |)
      |SELECT doc_id,
      |       trim(regexp_extract(framed, '\[INST\](.*?)\[/INST\]', 1)) AS instruction,
      |       trim(regexp_extract(framed, '\[/INST\](.*)$', 1)) AS response
      |FROM framed ORDER BY doc_id""".stripMargin

  /** Chunking geometry for q32: window of 32 tokens, stride 16 (50%
    * overlap) — the standard long-document split for context-bounded
    * training/embedding.
    */
  val ChunkSize = 32; val ChunkStride = 16

  /** q32_chunk_documents — split each document into overlapping token
    * windows; trailing chunks may be short. One chunk per stride start
    * below the token count, so every token lands in ≥1 chunk. Pure array
    * expressions + one posexplode: chunking is scan-local, no shuffle at
    * all until a downstream operator needs one.
    */
  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenArr(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $ChunkStride.0) as int) - 1), " +
          s"i -> slice(toks, i * $ChunkStride + 1, $ChunkSize))")))
      .toDF("doc_id", "chunk_id", "chunk")
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q32OracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         generate_subscripts(chunks, 1) - 1 AS chunk_id,
       |         unnest(chunks) AS chunk
       |  FROM (SELECT doc_id,
       |               list_transform(range(0, CAST(ceil(len(toks) / $ChunkStride.0) AS INT)),
       |                 i -> toks[i * $ChunkStride + 1 : i * $ChunkStride + $ChunkSize]) AS chunks
       |        FROM t WHERE len(toks) > 0)
       |)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |       CAST(len(chunk) AS BIGINT) AS n_tokens,
       |       array_to_string(chunk, ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** q37_set_ops_split — the train/val split expressed through relational
    * set operations (SURVEY.md §2A set ops): train = documents EXCEPT val,
    * sanity side = documents INTERSECT val; per-language counts of both.
    * Spark EXCEPT/INTERSECT are distinct-set semantics, same as SQL — at
    * scale both are hash aggregations on the full row (prefer the
    * anti-join/semi-join form with an explicit key, as q06 does, when rows
    * are wide).
    */
  def setOpsSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val valSide = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
    val train = docs.except(valSide)
    val inter = docs.intersect(valSide)
    train.groupBy(col("lang")).agg(count(lit(1)).as("n_train"))
      .join(inter.groupBy(col("lang")).agg(count(lit(1)).as("n_val")), Seq("lang"), "outer")
      .select(col("lang"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_val"), lit(0L)).as("n_val"))
      .orderBy(col("lang"))
  }

  val q37OracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, text FROM documents
      |), v AS (
      |  SELECT * FROM d WHERE doc_id % 10 = 9
      |), train AS (
      |  SELECT * FROM d EXCEPT SELECT * FROM v
      |), inter AS (
      |  SELECT * FROM d INTERSECT SELECT * FROM v
      |), t AS (
      |  SELECT lang, COUNT(*) AS n_train FROM train GROUP BY lang
      |), i AS (
      |  SELECT lang, COUNT(*) AS n_val FROM inter GROUP BY lang
      |)
      |SELECT COALESCE(t.lang, i.lang) AS lang,
      |       COALESCE(t.n_train, 0) AS n_train,
      |       COALESCE(i.n_val, 0) AS n_val
      |FROM t FULL OUTER JOIN i ON t.lang = i.lang
      |ORDER BY lang""".stripMargin

  /** q14_text_stats — per-document token count, distinct-token count, and
    * mean token length (north-star text-analysis operator; entirely
    * array-expression based so it stays inside whole-stage codegen).
    */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", tokenArr(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        when(size(col("toks")) === 0, lit(0.0))
          .otherwise(round(
            aggregate(col("toks"), lit(0.0), (acc, t) => acc + length(t).cast("double"))
              / size(col("toks")), 6))
          .as("avg_tok_len"))
      .orderBy(col("doc_id"))

  val q14OracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '(\w+|[^\w\s]+)', 1) AS toks FROM documents
      |)
      |SELECT doc_id,
      |       CAST(len(toks) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |       CASE WHEN len(toks) = 0 THEN 0.0
      |            ELSE round(list_aggregate(list_transform(toks, x -> CAST(len(x) AS DOUBLE)), 'sum') / len(toks), 6)
      |       END AS avg_tok_len
      |FROM t ORDER BY doc_id""".stripMargin

  /** q69_pack_sequences — training-sequence packing (round 6), the step
    * between tokenize and train: documents concatenate greedily into
    * fixed-budget training sequences (here 256 tokens), each doc assigned
    * the pack its RUNNING PREFIX starts in — the standard
    * pack-by-cumulative-length rule, deterministic for a fixed order.
    *
    * The scale decision is WHERE the running sum runs: a global cumsum is
    * a single-ordering anti-pattern (one task sorts the corpus), so docs
    * pack within (lang, shard) groups — shard = doc_id mod 8, the
    * per-output-file sharding every real pipeline packs inside anyway.
    * Group count scales with the corpus (K knob), each window is
    * corpus/|lang|/K rows, and packs never span shards (padding waste at
    * shard boundaries is the documented, bounded price). Emits one row
    * per doc: (lang, shard, doc_id, n_tokens, pack_id, pack_offset).
    */
  def packSequences(spark: SparkSession, sfDir: String, budget: Int = 256,
                    shards: Int = 8): DataFrame =
    packSequencesOf(Tables.documents(spark, sfDir), budget, shards)

  /** Composable core of q69 for ANY (doc_id, lang, text, …) corpus. */
  def packSequencesOf(docs: DataFrame, budget: Int = 256, shards: Int = 8): DataFrame = {
    val sized = docs
      .select(col("lang"), pmod(col("doc_id"), lit(shards)).cast("long").as("shard"),
        col("doc_id"), size(tokenArr(col("text"))).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sized
      .withColumn("prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("lang"), col("shard"), col("doc_id"), col("n_tokens"),
        floor(col("prefix") / budget).cast("long").as("pack_id"),
        pmod(col("prefix"), lit(budget.toLong)).as("pack_offset"))
      .orderBy(col("lang"), col("shard"), col("doc_id"))
  }

  /** q89_length_buckets — LENGTH-BUCKETED batch planning, the other
    * resolution of padding waste besides packing (q69): docs group into
    * power-of-two token-length buckets (the fairseq/T5 loader scheme —
    * batches draw from one bucket, so padding is bounded by the bucket
    * ratio), and the plan reports per bucket: docs, batches at the fixed
    * batch size, real vs padded tokens, and the padding-waste fraction —
    * the number that decides bucket boundaries in a real loader config.
    *
    * The bucket is an integer CASE ladder (next power of two ≥ n), NOT
    * `ceil(log2 n)`: log2 has no IEEE correct-rounding guarantee, and at
    * exact powers of two a last-ulp excess flips the bucket — the same
    * cross-engine trap as q88's pow. 21 codegen'd comparisons, exact at
    * any length; docs past 2^20 tokens cap at the top bucket (a real
    * loader truncates them far earlier).
    *
    * 100 TB shape: token count + bucket are scan-local column work; the
    * only exchange carries ≤ 21 map-side-combined partial rows.
    */
  def lengthBuckets(spark: SparkSession, sfDir: String): DataFrame =
    lengthBucketsOf(Tables.documents(spark, sfDir))

  val BucketBatchSize = 32
  private val MaxBucketLog = 20

  /** Composable core for ANY (text, …) corpus. */
  def lengthBucketsOf(docs: DataFrame, batchSize: Int = BucketBatchSize): DataFrame = {
    val bucket = (1 to MaxBucketLog)
      .foldLeft(when(col("nt") <= 1L, 1L)) { (c, k) =>
        c.when(col("nt") <= (1L << k), 1L << k)
      }.otherwise(1L << MaxBucketLog)
    docs
      .select(size(tokenArr(col("text"))).cast("long").as("nt"))
      .select(col("nt"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"),
        expr(s"(n_docs + ${batchSize - 1}) div $batchSize").as("n_batches"),
        col("sum_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("sum_tokens").cast("double") / (col("bucket") * col("n_docs")), 6)
          .as("waste_frac"))
      .orderBy(col("bucket"))
  }

  val q89OracleSql: String = {
    val ladder = (1 to MaxBucketLog)
      .map(k => s"WHEN nt <= ${1L << k} THEN ${1L << k}")
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT CAST(len(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS BIGINT) AS nt
       |  FROM documents
       |), b AS (
       |  SELECT CASE WHEN nt <= 1 THEN 1 $ladder ELSE ${1L << MaxBucketLog} END AS bucket, nt
       |  FROM d
       |), g AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(nt) AS BIGINT) AS sum_tokens
       |  FROM b GROUP BY bucket
       |)
       |SELECT bucket, n_docs,
       |       CAST((n_docs + ${BucketBatchSize - 1}) // $BucketBatchSize AS BIGINT) AS n_batches,
       |       sum_tokens,
       |       bucket * n_docs AS padded_tokens,
       |       ROUND(1.0 - CAST(sum_tokens AS DOUBLE) / (bucket * n_docs), 6) AS waste_frac
       |FROM g ORDER BY bucket""".stripMargin
  }

  val q69OracleSql: String =
    """WITH d AS (
      |  SELECT lang, doc_id % 8 AS shard, doc_id,
      |         CAST(len(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1)) AS BIGINT) AS n_tokens
      |  FROM documents
      |), p AS (
      |  SELECT lang, shard, doc_id, n_tokens,
      |         COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      |  FROM d
      |)
      |SELECT lang, shard, doc_id, n_tokens,
      |       CAST(prefix // 256 AS BIGINT) AS pack_id,
      |       CAST(prefix % 256 AS BIGINT) AS pack_offset
      |FROM p
      |ORDER BY lang, shard, doc_id""".stripMargin
}
