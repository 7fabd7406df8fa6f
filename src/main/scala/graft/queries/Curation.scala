package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.queries.QueryUtil.{cents, centsSql}

/** Corpus-curation operators a 100 TB training-data pipeline runs
  * between raw ingest and tokenization (builder brief §LLM-pipeline):
  * PII scrubbing, benchmark decontamination, stratified data mixing,
  * and within-document repetition scoring. Each is oracle-checked
  * (hash-exact vs DuckDB) like the §2.D inventory.
  *
  * Scale notes per query are inline; the common theme: map-side
  * expression trees where possible, and when a join is unavoidable
  * (decontamination) the join key is the n-gram itself with the small
  * eval side broadcast — candidate volume is bounded by the eval set,
  * never the corpus.
  */
object Curation {

  // Spark `split(trim, \s+)` ≡ DuckDB `string_split_regex(trim, '\s+')`
  private def words(c: Column): Column = split(trim(c), "\\s+")

  // ── PII scrubbing ──────────────────────────────────────────────────

  /** Redact emails and phone numbers. The synthetic corpus has no PII,
    * so both engines first append a deterministic contact line (one
    * email + one phone derived from doc_id) and then scrub it — the
    * regex machinery is exercised for real, and the oracle mirrors the
    * construction exactly. Pure map-side: one scan, no shuffle beyond
    * the output sort; at 100 TB this is a projection pipeline.
    *
    * Patterns stay in the RE2 ∩ Java-regex dialect intersection so both
    * engines compile them identically. */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\+1-555-[0-9]{4}"
    val tainted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val nEmails = size(regexp_extract_all(tainted, lit(emailPat), lit(0))).cast(LongType)
    val nPhones = size(regexp_extract_all(tainted, lit(phonePat), lit(0))).cast(LongType)
    val scrubbed = regexp_replace(
      regexp_replace(tainted, emailPat, "<EMAIL>"), phonePat, "<PHONE>")
    Tables.documents(s, dir).select(
      col("doc_id"),
      nEmails.as("n_emails"),
      nPhones.as("n_phones"),
      length(scrubbed).cast(LongType).as("scrubbed_len"),
      substring(scrubbed, -40, 40).as("tail40"))
      .orderBy("doc_id")
  }

  private val qPiiScrubOracle = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phonePat = "\\+1-555-[0-9]{4}"
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com or +1-555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS tainted
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(tainted, '$emailPat')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(tainted, '$phonePat')) AS BIGINT) AS n_phones,
       |  CAST(length(regexp_replace(regexp_replace(tainted, '$emailPat', '<EMAIL>', 'g'),
       |    '$phonePat', '<PHONE>', 'g')) AS BIGINT) AS scrubbed_len,
       |  right(regexp_replace(regexp_replace(tainted, '$emailPat', '<EMAIL>', 'g'),
       |    '$phonePat', '<PHONE>', 'g'), 40) AS tail40
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ── benchmark decontamination ──────────────────────────────────────

  /** Train/eval n-gram overlap: the eval set is every 97th document;
    * a training document is contaminated if it shares any word 5-gram
    * with any eval document. Output: contaminated train docs with the
    * count of distinct shared 5-grams.
    *
    * Scale: both sides explode to (ngram, doc) pairs; the EVAL side is
    * corpus/97 docs → its distinct-ngram set is small and broadcast, so
    * the corpus-side cost is one scan + one broadcast-hash probe, no
    * all-pairs anything. (On a petabyte corpus the eval set — real
    * benchmarks — is tiny, exactly this shape.) */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // fused codegen kernel (byte-identical to the transform/slice HOF
    // form incl. the short-doc empty-array guard — WordNgramsSpec)
    def ngrams(n: Int): Column = graft.functions.WordNgrams.grams(col("text"), n)
    val exploded = docs.select(col("doc_id"), explode(ngrams(5)).as("gram"))
    val evalGrams = exploded.filter(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct()
    exploded.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  private val qDecontaminateOracle =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(1, len(string_split_regex(trim(text), '\s+')) - 3),
      |    i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+4], ' '))) AS gram
      |  FROM documents),
      |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
      |SELECT doc_id, CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_shared_grams
      |FROM g JOIN ev USING (gram)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bloom-filter decontamination — the 100 TB twin of
    * [[qDecontaminate]]. Broadcasting the eval set's distinct n-grams
    * scales with the EVAL corpus; a Bloom filter does not: the eval
    * grams aggregate into a fixed m-bit array (m/64 longs, built with
    * one bit_or aggregation over k probe positions per gram) and only
    * THAT broadcasts. Corpus grams probe their k positions against the
    * broadcast words and survive only if every bit is set.
    *
    * Guarantees: no false negatives (every truly shared gram hits all k
    * bits), false-positive grams at rate ≈ (1 - e^(-kn/m))^k — candidates
    * then flow to the same exact verification join q_decontaminate runs,
    * so FPs cost work, never correctness. Rows-only by declared design
    * (the bit array is engine-internal); BloomDecontaminateSpec pins the
    * superset property and the FP bound against the exact query. */
  /** Bloom size policy: the FP rate (1−e^(−kn/m))^k is LOAD-FACTOR
    * conditional — a fixed m=2^20 only honors the ~1e-6 scaladoc bound
    * while the eval-gram count n stays small (at sf0.1 the realized
    * rate was within ~4× of the 1 % gate ceiling). So m scales with n:
    * m ≥ 32·n (next power of two) keeps the rate ≤ (1−e^(−3/32))^3 ≈
    * 7×10⁻⁴ at ANY corpus size — the gate margin is corpus-invariant.
    * The count is one distinct-aggregate over the (1/97-sized) eval
    * split, a 1-row driver read (the documented bounded pattern). */
  private def bloomBitsFor(nEvalGrams: Long): Long = {
    var m = 1L << 20
    while (m < 32L * nEvalGrams && m < (1L << 40)) m <<= 1
    m
  }

  def qBloomDecontaminate(s: SparkSession, dir: String,
                          mBitsOverride: Long = 0L, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val exploded = docs.select(col("doc_id"),
      explode(graft.functions.WordNgrams.grams(col("text"), 5)).as("gram"))
    val mBits = if (mBitsOverride > 0) mBitsOverride
      else bloomBitsFor(exploded.filter(col("doc_id") % 97 === 0)
        .select(col("gram")).distinct().count())
    def pos(i: Int): Column = pmod(xxhash64(col("gram"), lit(i)), lit(mBits))
    def word(p: Column): Column = p.divide(64).cast(LongType)
    def mask(p: Column): Column =
      call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
    val probes = array((0 until k).map(pos): _*)

    val bits = exploded.filter(col("doc_id") % 97 === 0)
      .select(explode(probes).as("p"))
      .select(word(col("p")).as("w"), mask(col("p")).as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))

    exploded.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("gram"), explode(probes).as("p"))
      .select(col("doc_id"), col("gram"), word(col("p")).as("w"), mask(col("p")).as("m"))
      .join(broadcast(bits), "w")
      .filter(col("bits").bitwiseAND(col("m")) =!= 0L)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n_bits_hit"))
      .filter(col("n_bits_hit") === k)
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_candidate_grams"))
      .orderBy("doc_id")
  }

  /** The registry form of [[qBloomDecontaminate]], oracle-GATED
    * (round-14, the q_agg_percentile_approx recipe): the bit array is
    * engine-internal (Spark xxhash64 probes — DuckDB cannot replay
    * them), but BOTH Bloom guarantees are exactly checkable in-query:
    *
    *  - NO FALSE NEGATIVES: every truly-shared (corpus∩eval) 5-gram
    *    must survive the k-bit probe. Per doc, the exact shared-gram
    *    set (the same join [[qDecontaminate]] runs) anti-joins the
    *    candidate set; `ok_superset` is 1 iff nothing is missing.
    *  - BOUNDED FALSE POSITIVES: globally, candidate (doc,gram) pairs
    *    beyond the truly-shared ones must stay under 1 % of probed
    *    pairs ((1−e^(−kn/m))^k ≈ 10⁻⁶ at these knobs — 1 % is the
    *    loud-failure ceiling, deterministic per corpus since probes
    *    are seeded). `ok_fp_budget` rides every row as a broadcast
    *    1-row scalar.
    *
    * Output rows are the docs with ≥1 truly-shared gram (the
    * contamination report's real content — SQL-enumerable), so DuckDB
    * mirrors doc ids, exact shared counts, and the all-ones flags: a
    * probe regression (wrong bit math, a lost word) hash-fails the
    * entry either through a 0 flag or a vanished doc. Production form
    * stays [[qBloomDecontaminate]] (fixed-size bit array only); the
    * gate adds the exact verification join a nightly validation run
    * executes anyway (the scaladoc above: candidates flow to exact
    * verification, FPs cost work, never correctness). */
  def qBloomDecontaminateGated(s: SparkSession, dir: String,
                               mBitsOverride: Long = 0L, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val exploded = docs.select(col("doc_id"),
      explode(graft.functions.WordNgrams.grams(col("text"), 5)).as("gram"))
    // same load-factor-stable sizing as qBloomDecontaminate: the 1 %
    // ok_fp_budget gate stays corpus-invariant as verify SFs grow
    val mBits = if (mBitsOverride > 0) mBitsOverride
      else bloomBitsFor(exploded.filter(col("doc_id") % 97 === 0)
        .select(col("gram")).distinct().count())
    def pos(i: Int): Column = pmod(xxhash64(col("gram"), lit(i)), lit(mBits))
    def word(p: Column): Column = p.divide(64).cast(LongType)
    def mask(p: Column): Column =
      call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
    val probes = array((0 until k).map(pos): _*)
    val bits = exploded.filter(col("doc_id") % 97 === 0)
      .select(explode(probes).as("p"))
      .select(word(col("p")).as("w"), mask(col("p")).as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
    val probed = exploded.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("gram")).distinct()
    val candGrams = probed
      .select(col("doc_id"), col("gram"), explode(probes).as("p"))
      .select(col("doc_id"), col("gram"), word(col("p")).as("w"), mask(col("p")).as("m"))
      .join(broadcast(bits), "w")
      .filter(col("bits").bitwiseAND(col("m")) =!= 0L)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("n_bits_hit"))
      .filter(col("n_bits_hit") === k)
      .select(col("doc_id"), col("gram"))
      .localCheckpoint() // candidate pairs — read twice below, bounded
    val evalGrams = exploded.filter(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct()
    val shared = probed.join(evalGrams, "gram")
      .localCheckpoint() // truly-shared pairs — read twice below
    val missing = shared.join(candGrams, Seq("doc_id", "gram"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_missing"))
    val fpBudget = candGrams.agg(count(lit(1)).as("n_cand"))
      .crossJoin(shared.agg(count(lit(1)).as("n_shared_tot")))
      .crossJoin(probed.agg(count(lit(1)).as("n_probed")))
      .select(when((col("n_cand") - col("n_shared_tot")) * 100 <= col("n_probed"),
        1L).otherwise(0L).as("ok_fp_budget"))
    shared.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .join(missing, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shared_grams"),
        when(coalesce(col("n_missing"), lit(0L)) === 0L, 1L).otherwise(0L)
          .as("ok_superset"))
      .crossJoin(broadcast(fpBudget))
      .orderBy("doc_id")
  }

  private val qBloomDecontaminateGatedOracle =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(1, len(string_split_regex(trim(text), '\s+')) - 3),
      |    i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+4], ' '))) AS gram
      |  FROM documents),
      |gd AS (SELECT DISTINCT doc_id, gram FROM g),
      |ev AS (SELECT DISTINCT gram FROM gd WHERE doc_id % 97 = 0)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams,
      |  CAST(1 AS BIGINT) AS ok_superset,
      |  CAST(1 AS BIGINT) AS ok_fp_budget
      |FROM gd JOIN ev USING (gram)
      |WHERE doc_id % 97 <> 0
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** SEMANTIC decontamination — the third member of the family
    * (exact n-gram [[qDecontaminate]], Bloom-screened
    * [[qBloomDecontaminateGated]], and THIS: embedding-space), catching
    * what token overlap cannot — paraphrased or re-encoded benchmark
    * leakage. The EVAL set (vec_id % 97 = 0, the family's split
    * convention) builds a random-hyperplane LSH band index ONCE; the
    * TRAIN corpus signs per row and probes the BROADCAST index on
    * (band, bucket) — the right join direction at 100 TB, where eval
    * is thousands of rows and train is the corpus: the index is
    * eval-sized, the probe is map-side, and total cost is linear in
    * TRAIN with no train-side index ever built. Candidates verify by
    * exact cosine ≥ τ (bit-exact both engines), and the output is the
    * removal manifest per label: train size, flagged count, flagged-id
    * checksum — what a curation job actually persists.
    *
    * The feed plants the contamination this screen exists to catch:
    * every 3rd eval vector re-encoded (+0.02 uniform drift, cosine ≈ 1
    * to its source) into the train side under a derived max(vec_id)+1
    * id offset (collision-proof on any corpus; oracle mirrors). The
    * organic corpus has no cross-split ≥τ pairs (max cosine ≈ 0.6,
    * measured), and the seeded plane matrix catches a 0.999-cosine
    * pair with miss probability ~1e-19 — so the brute-force train×eval
    * DuckDB oracle is a deterministic end-to-end hash gate at all
    * three SFs, the q_dedup_embed_incremental recipe in the opposite
    * probe direction. */
  def qDecontaminateSemantic(s: SparkSession, dir: String,
      threshold: Double = 0.95, dims: Int = 64): DataFrame = {
    import graft.functions.{LshSignature, VectorOps}
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("vec"))
    val off = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val eval = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("label"), col("vec"))
    val contam = eval.filter(col("eval_id") % 3 === 0)
      .select((col("eval_id") + lit(off)).as("vec_id"), col("label"),
        transform(col("vec"), x => x + lit(0.02)).as("vec"))
    val train = emb.filter(col("vec_id") % 97 =!= 0)
      .unionByName(contam)
    val nEval = math.max(eval.count(), 2L) // index plan constant (1-long driver agg)
    val bits = math.min(15, math.max(10,
      math.ceil(math.log(nEval.toDouble) / math.log(2)).toInt - 1))
    def sigs(df: DataFrame, idCol: String) = df
      .select(col(idCol), VectorOps.normalized(col("vec")).as("nvec"))
      .select(col(idCol),
        posexplode(LshSignature.signature(col("nvec"), dims, bits = bits))
          .as(Seq("band", "bucket")))
    val evalIndex = sigs(eval, "eval_id").localCheckpoint()
    val cand = sigs(train.select(col("vec_id"), col("vec")), "vec_id")
      .join(broadcast(evalIndex), Seq("band", "bucket"))
      .select(col("vec_id"), col("eval_id")).distinct()
    val tN = train.select(col("vec_id"),
      VectorOps.normalized(col("vec")).as("t_nvec"))
    val eN = eval.select(col("eval_id"),
      VectorOps.normalized(col("vec")).as("e_nvec"))
    val flagged = cand.join(tN, "vec_id").join(eN, "eval_id")
      .filter(VectorOps.dotD(col("t_nvec"), col("e_nvec")) >= threshold)
      .select(col("vec_id")).distinct()
      .withColumn("hit", lit(1L))
    // flagged is contamination-sized (bounded by the verified hits), so
    // the manifest join broadcasts and the only shuffle left on the
    // train side is the label-count combine (map-side partials)
    train.select(col("vec_id"), col("label"))
      .join(broadcast(flagged), Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("hit"), lit(0L))).cast(LongType).as("n_flagged"),
        sum(when(col("hit") === 1L, col("vec_id")).otherwise(lit(0L)))
          .cast(LongType).as("flagged_key_sum"))
      .orderBy("label")
  }

  private val qDecontaminateSemanticOracle = {
    import graft.functions.VectorOps.{dotDSql, normalizedSql}
    val nvecV = s"""list_transform(vec, x -> x / sqrt(${dotDSql("vec", "vec")}))"""
    s"""WITH emb AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, label, $nvecV AS nvec
       |       FROM emb WHERE vec_id % 97 = 0),
       |contam AS (
       |  SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id,
       |    label, list_transform(vec, x -> x + 0.02) AS vec
       |  FROM emb WHERE vec_id % 97 = 0 AND vec_id % 3 = 0),
       |train AS (
       |  SELECT vec_id, label, vec FROM emb WHERE vec_id % 97 <> 0
       |  UNION ALL SELECT vec_id, label, vec FROM contam),
       |tn AS (SELECT vec_id, label, $nvecV AS nvec FROM train),
       |flagged AS (
       |  SELECT DISTINCT t.vec_id
       |  FROM tn t CROSS JOIN ev e
       |  WHERE ${dotDSql("t.nvec", "e.nvec")} >= 0.95)
       |SELECT t.label, COUNT(*) AS n_train,
       |  CAST(SUM(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_flagged,
       |  CAST(SUM(CASE WHEN f.vec_id IS NOT NULL THEN t.vec_id ELSE 0 END)
       |    AS BIGINT) AS flagged_key_sum
       |FROM tn t LEFT JOIN flagged f ON t.vec_id = f.vec_id
       |GROUP BY t.label ORDER BY t.label""".stripMargin
  }

  // ── stratified data mixing ─────────────────────────────────────────

  /** Exact-quota stratified sample: the N "best-shuffled" docs per
    * source, ranked by a deterministic pseudo-random key (a multiplicative
    * hash both engines compute identically in 64-bit integer math —
    * cross-engine xxhash is NOT portable, arithmetic is). One window
    * shuffle on source; at 100 TB each stratum ranks independently, and
    * rank-≤N short-circuits via the window's running filter. */
  def qDataMix(s: SparkSession, dir: String, quota: Int = 100): DataFrame = {
    // Reduce doc_id modulo the prime BEFORE the multiply: the product
    // then tops out at ~2.65e18 < i64 max, so the key never overflows
    // (ANSI mode would throw) no matter how large doc_id grows.
    val key = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    val rn = row_number().over(
      Window.partitionBy(col("source")).orderBy(key.asc, col("doc_id").asc))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), key.as("mix_key"),
        rn.cast(LongType).as("mix_rank"))
      .filter(col("mix_rank") <= quota)
      .orderBy("source", "mix_rank")
  }

  private val qDataMixOracle =
    """WITH r AS (
      |  SELECT doc_id, source, ((doc_id % 1000000007) * 2654435761) % 1000000007 AS mix_key,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007 ASC, doc_id ASC) AS mix_rank
      |  FROM documents)
      |SELECT doc_id, source, mix_key, CAST(mix_rank AS BIGINT) AS mix_rank
      |FROM r WHERE mix_rank <= 100 ORDER BY source, mix_rank""".stripMargin

  // ── within-document repetition ─────────────────────────────────────

  /** Repetition quality signal (the CommonCrawl-style filter): fraction
    * of repeated words and the most-frequent word's share, per doc.
    * One explode + one two-key aggregation — the groupBy(doc, word)
    * combines map-side, so the shuffle carries (doc, word) partial
    * counts, not raw tokens. All ratios are int-ratio doubles
    * (cross-engine deterministic). */
  def qDocRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast(LongType).as("n_words"),
        count(lit(1)).cast(LongType).as("n_distinct"),
        max(col("c")).cast(LongType).as("top_freq"))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast(DoubleType) /
          col("n_words").cast(DoubleType), 6).as("rep_ratio"),
        round(col("top_freq").cast(DoubleType) /
          col("n_words").cast(DoubleType), 6).as("top_share"))
      .orderBy("doc_id")
  }

  private val qDocRepetitionOracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
      |a AS (
      |  SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct, MAX(c) AS top_freq
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS rep_ratio,
      |  round(CAST(top_freq AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS top_share
      |FROM a ORDER BY doc_id""".stripMargin

  // ── context-window packing ─────────────────────────────────────────

  /** Sequential-fill packing of documents into fixed token budgets
    * (context windows): within each source stratum, docs are laid out
    * in doc_id order and each doc is assigned the bin where its START
    * offset lands (`bin = floor(start / budget)`), plus its offset in
    * that bin — the deterministic prefix-sum form of greedy packing
    * that a tokenizer stage consumes. Token count = whitespace words
    * (the pipeline's cheap proxy; q_text_tokens holds the BPE-ish
    * counter).
    *
    * Scale: the running sum windows by SOURCE, not globally — each
    * stratum's prefix sum is an independent partition, so no
    * single-partition window bottleneck at 100 TB (packing across the
    * whole corpus would serialize; packing per mix-stream is what the
    * training pipeline wants anyway). */
  def qContextPack(s: SparkSession, dir: String, budget: Int = 2048): DataFrame = {
    val nTokens = size(words(col("text"))).cast(LongType)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), nTokens.as("n_tokens"))
      .withColumn("start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        (col("start") / budget).cast(LongType).as("bin_id"),
        pmod(col("start"), lit(budget.toLong)).as("bin_offset"))
      .orderBy("source", "doc_id")
  }

  private val qContextPackOracle =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start
      |  FROM t)
      |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(start // 2048 AS BIGINT) AS bin_id,
      |  CAST(start % 2048 AS BIGINT) AS bin_offset
      |FROM c ORDER BY source, doc_id""".stripMargin

  // ── URL parsing ────────────────────────────────────────────────────

  /** URL decomposition (host / path / query param) — the first step of
    * web-corpus curation (per-domain quotas, URL dedup, blocklists).
    * The corpus has no URL column, so a deterministic URL is built from
    * (source, lang, doc_id) and then parsed with Spark's codegen'd
    * `parse_url`; the oracle reconstructs each component directly from
    * the same fields, so the parse is verified against ground truth
    * rather than a second parser. Pure map-side. */
  def qUrlExtract(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example.org/"),
      col("lang"), lit("/doc/"), col("doc_id"), lit("?ref=r"),
      pmod(col("doc_id"), lit(7)))
    Tables.documents(s, dir).select(
      col("doc_id"),
      parse_url(url, lit("HOST")).as("host"),
      parse_url(url, lit("PATH")).as("path"),
      parse_url(url, lit("QUERY"), lit("ref")).as("ref"))
      .orderBy("doc_id")
  }

  private val qUrlExtractOracle =
    """SELECT doc_id,
      |  source || '.example.org' AS host,
      |  '/' || lang || '/doc/' || doc_id AS path,
      |  'r' || (doc_id % 7) AS ref
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── deterministic corpus sampling ──────────────────────────────────

  /** Hash-Bernoulli sample: keep a document iff its multiplicative-hash
    * bucket falls under the rate — deterministic (rerun-, repartition-
    * and scale-stable, unlike `rand()`-based TABLESAMPLE), purely
    * map-side, and composable (disjoint rates give disjoint strata).
    * The complement of q_data_mix: no quota, no window, no shuffle —
    * the right shape when "roughly p%" is enough at 100 TB. */
  def qSampleHash(s: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    val key = pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    val bucket = pmod(key, lit(100))
    Tables.documents(s, dir)
      .filter(bucket < pct)
      .select(col("doc_id"), col("source"), bucket.cast(LongType).as("bucket"))
      .orderBy("doc_id")
  }

  private val qSampleHashOracle =
    """SELECT doc_id, source,
      |  ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 AS bucket
      |FROM documents
      |WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 100 < 10
      |ORDER BY doc_id""".stripMargin

  /** Stratified hash sample: each language stratum keeps a DIFFERENT
    * rate — the knob a training-mix pipeline turns to rebalance a
    * web-skewed corpus (downsample the dominant language, keep the
    * long tail). Same deterministic multiplicative-hash Bernoulli
    * trial as q_sample_hash, so strata are rerun- and scale-stable and
    * the per-language rates compose into one map-side predicate. The
    * output is the sampling MANIFEST (per-stratum kept/total counts,
    * kept bytes, kept-key checksum) — what the mix designer audits
    * before launching the real multi-day write.
    *
    * Scale: the trial is map-side arithmetic on each row; the manifest
    * is one combine-friendly groupBy with `|langs|` groups. No second
    * pass, no window, no per-stratum job. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
      lit(100L))
    // en is the over-represented stratum: keep 20 %; mid-resource zh
    // keeps 60 %; the long tail (de/es/fr) keeps everything.
    val rate = when(col("lang") === "en", 20)
      .when(col("lang") === "zh", 60)
      .otherwise(100)
    val kept = (bucket < rate).cast(LongType)
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(kept).cast(LongType).as("n_kept"),
        sum(kept * col("n_chars")).cast(LongType).as("kept_chars"),
        sum(kept * col("doc_id")).cast(LongType).as("kept_key_sum"))
      .orderBy("lang")
  }

  private val qSampleStratifiedOracle =
    """SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars,
      |  CAST(SUM(kept * doc_id) AS BIGINT) AS kept_key_sum
      |FROM (
      |  SELECT lang, n_chars, doc_id,
      |    CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 <
      |      (CASE WHEN lang = 'en' THEN 20
      |            WHEN lang = 'zh' THEN 60 ELSE 100 END)
      |    THEN 1 ELSE 0 END AS kept
      |  FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic train/validation/test holdout split — the
    * contamination firewall every training corpus needs: membership is
    * a pure function of the stable document key (never `rand()`, which
    * re-deals the split on every rerun/retry and leaks eval docs into
    * training). Hash bucket 0-89 → train, 90-94 → val, 95-99 → test.
    * The output is the split manifest (counts, bytes, key checksum and
    * range per split) — the audit artifact recorded next to the run.
    *
    * Scale: map-side bucket arithmetic + one 3-group aggregation; the
    * actual split write is then three disjoint filters over the same
    * scan (or one partitioned write on split_name). */
  def qSplitHoldout(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
      lit(100L))
    val split = when(bucket < 90, "train")
      .when(bucket < 95, "val")
      .otherwise("test")
    Tables.documents(s, dir)
      .withColumn("split_name", split)
      .groupBy(col("split_name"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("total_chars"),
        sum(col("doc_id")).cast(LongType).as("key_sum"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split_name")
  }

  private val qSplitHoldoutOracle =
    """SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
      |  ELSE 'test' END AS split_name,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(doc_id) AS BIGINT) AS key_sum,
      |  MIN(doc_id) AS min_doc,
      |  MAX(doc_id) AS max_doc
      |FROM (
      |  SELECT doc_id, n_chars,
      |    ((doc_id % 1000000007) * 2654435761) % 100 AS b
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Z-order layout manifest — the lakehouse data-layout job that makes
    * MULTI-column data skipping work: interleave the bits of two filter
    * dimensions (part key, supplier key) into one Morton z-value, bucket
    * rows by equal-width z-ranges (a file boundary stand-in), and emit
    * each bucket's row count and per-dimension min/max — the bounding
    * boxes a reader's skipping index consults. Sorting by ONE key gives
    * tight bounds on that key only (a filter on the other key scans
    * every file); the z-curve bounds BOTH, which ZorderSpec quantifies
    * (single-supplier filters touch a fraction of z-buckets vs ALL
    * partkey-sorted buckets).
    *
    * Scale: the z-value is 32 codegen'd bit terms, pure map-side; the
    * manifest is one combine-friendly groupBy on (z >> shift). The real
    * layout write is `repartitionByRange(z).sortWithinPartitions(z)` —
    * same key, and the manifest is its file-footer statistics. */
  /** 32-bit Morton interleave of two 16-bit values (a's bits land on
    * odd positions, b's on even) — 32 codegen'd bit terms, no UDF.
    * Locality properties (per-dimension monotonicity, range) are
    * property-tested in ZorderSpec. */
  private[graft] def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce((x, y) => x.bitwiseOR(y))

  def qZorderLayout(s: SparkSession, dir: String, shift: Int = 24): DataFrame = {
    // Normalize both dimensions to a common 16-bit width first (integer
    // `div`, exact in both engines) — raw interleaving of unequal-width
    // keys lets the wider key's high bits monopolize the bucket index
    // and the narrow dimension gets no pruning at all. The max scalars
    // arrive via a broadcast 1-row aggregate (the q_tfidf pattern).
    val li = Tables.lineitem(s, dir)
    val mx = li.agg(max(col("l_partkey")).as("pmax"),
      max(col("l_suppkey")).as("smax"))
    val a = expr("(l_partkey * 65536) div (pmax + 1)")
    val b = expr("(l_suppkey * 65536) div (smax + 1)")
    val z = morton16(a, b)
    li.crossJoin(broadcast(mx))
      .withColumn("bucket", shiftright(z, shift))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .orderBy("bucket")
  }

  private val qZorderLayoutOracle = {
    val z = (0 until 16).map { i =>
      s"(((a >> $i) & 1) << ${2 * i + 1}) | (((b >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")
    s"""WITH mx AS (
       |  SELECT MAX(l_partkey) AS pmax, MAX(l_suppkey) AS smax FROM lineitem),
       |n AS (
       |  SELECT l_partkey, l_suppkey,
       |    (l_partkey * 65536) // (pmax + 1) AS a,
       |    (l_suppkey * 65536) // (smax + 1) AS b
       |  FROM lineitem, mx)
       |SELECT ($z) >> 24 AS bucket,
       |  COUNT(*) AS n_rows,
       |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
       |FROM n GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ── deterministic output sharding ──────────────────────────────────

  /** Shard assignment for the output-writing stage: every document maps
    * to one of `shards` output shards by the portable multiplicative
    * hash (rerun-, repartition- and scale-stable — the property that
    * makes incremental re-runs append to the SAME shard). The result is
    * the shard manifest: per-shard doc count, byte load, and key range —
    * what a writer job consults to size its tasks and what a balance
    * monitor alerts on.
    *
    * Scale: the hash is map-side; the manifest is one combine-friendly
    * groupBy with `shards` groups, so the shuffle carries `shards` rows
    * per task no matter the corpus size. The actual write is then
    * `df.repartition(shards, shard_col).write` — same key, co-located. */
  def qShardAssign(s: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    val shard = pmod(
      pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L), lit(shards.toLong))
    Tables.documents(s, dir)
      .withColumn("shard", shard)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("shard")
  }

  private val qShardAssignOracle =
    """SELECT ((doc_id % 1000000007) * 2654435761) % 16 AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_doc,
      |  MAX(doc_id) AS max_doc
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ── URL canonicalization + dedup ───────────────────────────────────

  /** URL-level dedup: crawl frontiers see the same page under many
    * spellings — host casing, explicit default port, fragments, trailing
    * slashes. Canonicalize (lowercase host, drop `:443`, strip
    * `#fragment`, strip one trailing slash) then group: one row per
    * canonical URL with the variant count and the first doc that carried
    * it. Raw variants are synthesized deterministically from doc_id so
    * both engines build the identical messy corpus (~5 docs per target
    * URL at sf0.01 — real duplication, not 1:1).
    *
    * Scale: canonicalization is map-side string work; the dedup is one
    * shuffle on the canonical key — exactly q_dedup_exact's shape. */
  def qDedupUrl(s: SparkSession, dir: String): DataFrame = {
    val target = pmod(col("doc_id"), lit(100))
    val host = when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("WWW.Site"), target, lit(".Example.ORG")))
      .otherwise(concat(lit("www.site"), target, lit(".example.org")))
    val port = when(pmod(col("doc_id"), lit(5)) === 0, lit(":443")).otherwise(lit(""))
    val slash = when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit(""))
    val frag = when(pmod(col("doc_id"), lit(4)) === 0, lit("#sec")).otherwise(lit(""))
    val raw = concat(lit("https://"), host, port, lit("/page/"), target, slash, frag)
    val canon = regexp_replace(
      regexp_replace(
        regexp_replace(lower(raw), "#.*$", ""), // fragment off (host already lowered)
        ":443/", "/"),                          // default port
      "/$", "")                                 // one trailing slash
    Tables.documents(s, dir)
      .select(col("doc_id"), canon.as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_doc"))
      .orderBy("canonical_url")
  }

  private val qDedupUrlOracle =
    """WITH raw AS (
      |  SELECT doc_id,
      |    'https://' ||
      |    CASE WHEN doc_id % 3 = 0
      |      THEN 'WWW.Site' || (doc_id % 100) || '.Example.ORG'
      |      ELSE 'www.site' || (doc_id % 100) || '.example.org' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
      |    '/page/' || (doc_id % 100) ||
      |    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END AS url
      |  FROM documents)
      |SELECT regexp_replace(regexp_replace(regexp_replace(
      |    lower(url), '#.*$', ''), ':443/', '/'), '/$', '') AS canonical_url,
      |  COUNT(*) AS n_variants,
      |  MIN(doc_id) AS keep_doc
      |FROM raw GROUP BY 1 ORDER BY 1""".stripMargin

  /** Domain-BLOCKLIST policy filter with SUBDOMAIN semantics — the
    * web-corpus hygiene step: a listed domain blocks itself AND every
    * subdomain ("src3.example.org" blocks "ads.src3.example.org"), a
    * listed subdomain blocks only itself. The mechanism is reversed
    * host labels ("org.example.src3"): subdomain-of becomes
    * string-prefix-of, so one broadcast of the reversed policy list
    * answers every row map-side. The manifest reports each document's
    * host, blocked flag, and the matching entry.
    *
    * Scale: the OR-join over a broadcast handful of entries plans a
    * broadcast nested-loop — fine to ~10³ policy entries. A production
    * 10⁵-entry blocklist swaps the join for a map-side probe of the
    * broadcast SORTED reversed-prefix array (binary search per row,
    * same reversal trick), keeping the scan shuffle-free either way;
    * the reversal is the load-bearing idea, not the join operator. */
  def qCurationBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def revLabels(c: Column): Column =
      array_join(reverse(split(c, "\\.")), ".")
    val host = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("ads."), col("source"), lit(".example.org")))
      .otherwise(concat(col("source"), lit(".example.org")))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), host.as("host"))
      .withColumn("rev", revLabels(col("host")))
    val entries = Seq("src3.example.org", "src7.example.org",
        "ads.src5.example.org").toDF("entry")
      .withColumn("rev_e", revLabels(col("entry")))
    docs.join(broadcast(entries),
        col("rev") === col("rev_e") ||
          col("rev").startsWith(concat(col("rev_e"), lit("."))),
        "left_outer")
      .groupBy(col("doc_id"), col("host"))
      .agg(min(col("entry")).as("matched_entry"))
      .select(col("doc_id"), col("host"),
        col("matched_entry").isNotNull.cast(LongType).as("blocked"),
        col("matched_entry"))
      .orderBy("doc_id")
  }

  private val qCurationBlocklistOracle =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'ads.' || source || '.example.org'
      |         ELSE source || '.example.org' END AS host
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, host,
      |    array_to_string(list_reverse(string_split(host, '.')), '.') AS rev
      |  FROM d),
      |b(entry) AS (VALUES ('src3.example.org'), ('src7.example.org'),
      |  ('ads.src5.example.org')),
      |rb AS (
      |  SELECT entry,
      |    array_to_string(list_reverse(string_split(entry, '.')), '.') AS rev_e
      |  FROM b),
      |j AS (
      |  SELECT r.doc_id, r.host, MIN(rb.entry) AS matched_entry
      |  FROM r LEFT JOIN rb
      |    ON r.rev = rb.rev_e OR starts_with(r.rev, rb.rev_e || '.')
      |  GROUP BY r.doc_id, r.host)
      |SELECT doc_id, host,
      |  CAST(matched_entry IS NOT NULL AS BIGINT) AS blocked, matched_entry
      |FROM j ORDER BY doc_id""".stripMargin

  // ── scalable global row numbering ──────────────────────────────────

  /** Contiguous global row numbers (0-gap, rank-by-key) WITHOUT the
    * classic scale trap: `row_number() OVER (ORDER BY key)` plans a
    * single-partition global Window — one task sorts the corpus. The
    * scalable shape is two-level: a monotone BUCKET function splits the
    * key domain (fixed-width ranges off a broadcast min/max — any
    * monotone-in-key bucketing works for correctness), per-bucket counts
    * prefix-sum into bucket OFFSETS (a `B`-row window, driver-free), and
    * a window PARTITIONED BY bucket ranks locally; global = offset +
    * local. One data shuffle (the bucket window) + a `B`-row side plan,
    * fully deterministic — what a shard-id/example-index assigner runs
    * at 100 TB instead of zipWithIndex.
    *
    * Skew note: fixed-width buckets inherit the key distribution; the
    * production variant draws bucket bounds from equi-depth quantiles
    * (q_hist_equidepth's sketch) — same plan shape, balanced buckets.
    * doc_id is near-uniform here, so the fixed-width form is exact AND
    * balanced while keeping the oracle integer-only. */
  def qCurationGlobalIndex(s: SparkSession, dir: String, buckets: Int = 64): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val bounds = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"(doc_id - mn) div ((mx - mn) div $buckets + 1)"))
      .select(col("doc_id"), col("bucket"))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    // the offsets window is single-partition over ≤ `buckets` rows —
    // side metadata, not data; the data-sized window below is
    // partitioned by bucket and runs all buckets in parallel
    bucketed
      .withColumn("local",
        row_number().over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))))
      .join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("bucket"),
        (col("offset") + col("local")).cast(LongType).as("global_idx"))
      .orderBy("doc_id")
  }

  private val qCurationGlobalIndexOracle =
    """WITH b AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents)
      |SELECT doc_id,
      |  (doc_id - mn) // ((mx - mn) // 64 + 1) AS bucket,
      |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS global_idx
      |FROM documents, b
      |ORDER BY doc_id""".stripMargin

  // ── per-source token budget ───────────────────────────────────────

  /** Per-source TOKEN-BUDGET enforcement — the mix-pipeline op after
    * proportions are chosen: each source contributes at most `budget`
    * tokens, selected as a PREFIX of its documents in a deterministic
    * pseudo-random priority (the q_sample_hash multiplicative key, tie
    * doc_id) so reruns and backfills cut at the identical boundary. A
    * doc that would cross the budget is dropped and so is everything
    * after it — the prefix rule, chosen over best-fit packing because
    * it is order-stable under corpus growth (new docs can only append
    * to the tail of the priority order... and the kept set never
    * reshuffles).
    *
    * The running token sum uses the TWO-LEVEL prefix-sum discipline
    * (q_curation_global_index): the priority key is uniform on
    * [0, 10⁹+7), so 64 equal-width key buckets are balanced BY
    * CONSTRUCTION (no value-skew caveat — contrast scalableNtile,
    * which needs sketch bounds because data values skew); per-(source,
    * bucket) partials prefix-sum over a ≤64-row side relation per
    * source, and every data-sized window is (source, bucket)-
    * partitioned. A dominant source therefore costs its rows/64 per
    * task, never a single-task sort. */
  def qCurationTokenBudget(s: SparkSession, dir: String,
      budget: Long = 800, buckets: Int = 64): DataFrame = {
    val p = 1000000007L
    val pri = pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p))
    val toks = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      size(words(col("text"))).cast(LongType).as("n_tokens"),
      pri.as("pri"))
      .withColumn("bucket", expr(s"pri div ${p / buckets + 1L}"))
    val offsets = toks.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("offset", coalesce(
        sum(col("btok")).over(Window.partitionBy(col("source"))
          .orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("bucket"), col("offset"))
    toks
      .withColumn("local", sum(col("n_tokens")).over(
        Window.partitionBy(col("source"), col("bucket"))
          .orderBy(col("pri"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_tokens", col("offset") + col("local"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens").cast(LongType).as("cum_tokens"))
      .orderBy("source", "cum_tokens", "doc_id")
  }

  private val qCurationTokenBudgetOracle =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS pri
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM t)
      |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM c WHERE cum_tokens <= 800
      |ORDER BY source, cum_tokens, doc_id""".stripMargin

  // ── hive-partitioned output layout ─────────────────────────────────

  /** Hive-partitioned corpus layout: write `partitionBy(lang)`, read the
    * result back with a partition predicate, and return the per-stratum
    * manifest. The write is REAL (a `lang=…/` directory tree under the
    * shared [[Scratch]] root — warehouse-dir default, overridable to any
    * Hadoop filesystem; round-18 verdict task 1: the first cut's
    * driver-local temp dir was the cluster-false path class the index
    * lifecycle had just purged), and the read-back filter prunes at
    * PLANNING time — only the matching directories are listed and
    * scanned, which at 100 TB is the difference between touching 2
    * strata and touching the corpus (PartitionLayoutSpec pins
    * `inputFiles` ⊆ the two pruned dirs, and runs the round trip under
    * a non-default scratch root).
    *
    * This is the reference's single-file Parquet sink re-expressed as a
    * cluster layout: the partition column moves into the directory
    * STRUCTURE (no lang column bytes in the files), and every downstream
    * per-language job — the mix sampler, the per-lang tokenizer — reads
    * its stratum without a filter scan. The manifest aggregates the
    * read-back (counts, bytes, key checksum per lang), so a row lost or
    * duplicated by the layout round-trip hash-fails the gate. */
  def qCurationPartitionLayout(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.freshDir(s, "partition_layout")
    try {
      Tables.documents(s, dir)
        .write.mode("overwrite").partitionBy("lang").parquet(out.toString)
      val manifest = s.read.parquet(out.toString)
        .filter(col("lang").isin("en", "zh"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          sum(col("doc_id")).cast(LongType).as("key_sum"))
        .orderBy("lang")
      // materialize (2 rows) before the layout dir is deleted below —
      // the registry contract returns a DataFrame the caller may
      // re-execute after this frame exits
      manifest.localCheckpoint(true)
    } finally Scratch.delete(s, out)
  }

  private val qCurationPartitionLayoutOracle =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(doc_id) AS BIGINT) AS key_sum
      |FROM documents WHERE lang IN ('en', 'zh')
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** k-anonymity audit — the privacy gate a corpus release runs before
    * publishing user-derived records: every quasi-identifier combination
    * shared by FEWER than k individuals is a re-identification risk and
    * must be suppressed or generalized. Quasi-identifiers here:
    * (nation, market segment, account-balance band of 1000); k = 5;
    * output = the violating equivalence classes with their sizes.
    *
    * The balance band is `floor((cents + 10⁸) / 10⁵)` with the SAME
    * IEEE op sequence in both engines: the +10⁸ shift keeps the
    * dividend non-negative (truncation vs floor-division conventions
    * never diverge), the operands stay ≪ 2⁵³, and the quotient sits
    * ≥ 10⁻⁵ away from any integer boundary so the correctly-rounded
    * division can't cross one. ONE combine-friendly aggregation; the
    * `< k` filter runs post-agg on class-count-sized data. At 100 TB
    * this is the same single shuffle — class cardinality (the output)
    * is bounded by the QI domain, not rows. */
  def qCurationKanon(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey").cast(LongType).as("nation"),
        col("c_mktsegment").as("segment"),
        floor((cents(col("c_acctbal")) + lit(100000000L)).cast(DoubleType)
          / 100000.0).cast(LongType).as("bal_band"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
      .orderBy("nation", "segment", "bal_band")

  private val qCurationKanonOracle =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |  c_mktsegment AS segment,
       |  CAST(floor(CAST(${centsSql("c_acctbal")} + 100000000 AS DOUBLE)
       |    / 100000.0) AS BIGINT) AS bal_band,
       |  COUNT(*) AS class_size
       |FROM customer
       |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
       |ORDER BY nation, segment, bal_band""".stripMargin

  /** Temperature-scaled mixture weights — the standard multilingual /
    * multi-source rebalancing rule (w ∝ n^α, here α = 1/2): raw
    * proportions over-sample the biggest source, uniform starves it,
    * the temperature interpolates. Reports per-language weight, the
    * normalized sampling probability, and the expected draw count at a
    * 10k budget.
    *
    * Determinism: counts are exact; √n is the correctly-rounded IEEE
    * sqrt; the normalizer Σ√nⱼ is an INDEX-ORDERED sequential fold
    * over the (tiny, bounded) language list — the VectorOps discipline
    * again, so the doubles are bit-identical with no rounding step.
    * Scale: one combine-friendly count, a language-cardinality-sized
    * fold, one broadcast back. */
  def qDataMixTemperature(s: SparkSession, dir: String,
                          budget: Long = 10000L): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("w", sqrt(col("n").cast(DoubleType)))
    val total = counts
      .agg(sort_array(collect_list(struct(col("lang"), col("w")))).as("arr"))
      .select(aggregate(transform(col("arr"), e => e.getField("w")),
        lit(0.0), (a, x) => a + x).as("z"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("n"), col("w"),
        (col("w") / col("z")).as("p"),
        (col("w") / col("z") * budget).as("expected_docs"))
      .orderBy("lang")
  }

  private val qDataMixTemperatureOracle =
    """WITH c AS (
      |  SELECT lang, COUNT(*) AS n, sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
      |  FROM documents GROUP BY lang),
      |z AS (SELECT list_reduce(list(w ORDER BY lang), (a, b) -> a + b) AS z
      |      FROM c)
      |SELECT lang, n, w, w / z AS p, w / z * 10000 AS expected_docs
      |FROM c, z ORDER BY lang""".stripMargin

  /** Weighted (probability-proportional-to-size) sampling WITHOUT
    * randomness: systematic PPS over the doc_id order. Cumulative
    * character weights lay the corpus on a [0, W) line; k equally
    * spaced thresholds select the k documents that straddle them, so
    * long documents are proportionally more likely to be drawn — the
    * standard weighted-sampling rule made deterministic and
    * re-runnable (the audit property a training-mix manifest needs).
    * Selection is pure integer arithmetic: doc selected iff
    * `(cum·k) div W > ((cum−w)·k) div W` (a threshold falls inside its
    * weight span). Headroom: cum·k must stay inside int64 — at k=100
    * that is 9·10¹⁶ total characters (~90 TB of text); past that,
    * thresholds shard per bucket.
    *
    * The corpus-length prefix sum reuses the bucketed discipline
    * (q_curation_global_index): within-bucket cumsums in parallel,
    * bucket totals prefix-summed once and broadcast back. */
  def qSampleWeighted(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      col("n_chars").cast(LongType).as("w"))
    val bounds = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
      sum(col("w")).cast(LongType).as("total"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr("(doc_id - mn) div ((mx - mn) div 64 + 1)"))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("w")).as("tot"))
      .withColumn("offset", coalesce(
        sum(col("tot")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed
      .withColumn("local", sum(col("w")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(offsets), "bucket")
      .withColumn("cum", col("offset") + col("local"))
      .filter(expr(s"(cum * $k) div total > ((cum - w) * $k) div total"))
      .select(col("doc_id"), col("w"),
        expr(s"(cum * $k) div total").cast(LongType).as("threshold_idx"))
      .orderBy("doc_id")
  }

  private val qSampleWeightedOracle =
    """WITH d AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
      |    SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(CAST(n_chars AS BIGINT)) OVER () AS total
      |  FROM documents)
      |SELECT doc_id, w,
      |  CAST((cum * 100) // total AS BIGINT) AS threshold_idx
      |FROM d
      |WHERE (cum * 100) // total > ((cum - w) * 100) // total
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_token_budget" -> ((s, d) => qCurationTokenBudget(s, d)),
    "q_sample_weighted" -> ((s, d) => qSampleWeighted(s, d)),
    "q_data_mix_temperature" -> ((s, d) => qDataMixTemperature(s, d)),
    "q_curation_kanon" -> ((s, d) => qCurationKanon(s, d)),
    "q_curation_global_index" -> ((s, d) => qCurationGlobalIndex(s, d)),
    "q_curation_partition_layout" -> (qCurationPartitionLayout _),
    "q_curation_blocklist" -> (qCurationBlocklist _),
    "q_shard_assign" -> ((s, d) => qShardAssign(s, d)),
    "q_dedup_url" -> (qDedupUrl _),
    "q_url_extract" -> (qUrlExtract _),
    "q_sample_hash" -> ((s, d) => qSampleHash(s, d)),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_zorder_layout" -> ((s, d) => qZorderLayout(s, d)),
    "q_split_holdout" -> (qSplitHoldout _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_bloom_decontaminate" -> ((s, d) => qBloomDecontaminateGated(s, d)),
    "q_decontaminate_semantic" -> ((s, d) => qDecontaminateSemantic(s, d)),
    "q_data_mix" -> ((s, d) => qDataMix(s, d)),
    "q_doc_repetition" -> (qDocRepetition _),
    "q_context_pack" -> ((s, d) => qContextPack(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q_curation_token_budget" -> qCurationTokenBudgetOracle,
    "q_sample_weighted" -> qSampleWeightedOracle,
    "q_data_mix_temperature" -> qDataMixTemperatureOracle,
    "q_curation_kanon" -> qCurationKanonOracle,
    "q_curation_global_index" -> qCurationGlobalIndexOracle,
    "q_curation_partition_layout" -> qCurationPartitionLayoutOracle,
    "q_curation_blocklist" -> qCurationBlocklistOracle,
    "q_shard_assign" -> qShardAssignOracle,
    "q_dedup_url" -> qDedupUrlOracle,
    "q_url_extract" -> qUrlExtractOracle,
    "q_sample_hash" -> qSampleHashOracle,
    "q_sample_stratified" -> qSampleStratifiedOracle,
    "q_zorder_layout" -> qZorderLayoutOracle,
    "q_split_holdout" -> qSplitHoldoutOracle,
    "q_pii_scrub" -> qPiiScrubOracle,
    "q_decontaminate" -> qDecontaminateOracle,
    "q_bloom_decontaminate" -> qBloomDecontaminateGatedOracle,
    "q_decontaminate_semantic" -> qDecontaminateSemanticOracle,
    "q_data_mix" -> qDataMixOracle,
    "q_doc_repetition" -> qDocRepetitionOracle,
    "q_context_pack" -> qContextPackOracle
  )
}
