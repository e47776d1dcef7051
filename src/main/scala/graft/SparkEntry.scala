package graft

import graft.core.{DedupConfig, Sessions}
import graft.ops.RelationalOps
import graft.pipeline.DedupPipeline
import graft.sim.EmbedOps
import graft.synth.CorpusGen
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-oracle SQL twin where the semantics
  * are ANSI-SQL-expressible (same column names both sides; the driver
  * sorts columns by name before hashing). Non-SQL-expressible operators
  * (MinHash/SimHash LSH, winnowing, ANN, the image pipeline) get
  * rows-only checks here and exact oracles in the ScalaTest suite.
  */
object SparkEntry {

  private val cfg = DedupConfig.default

  /** sfDir -> deterministic synthetic image-corpus size (groups of 8). */
  def groupsFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 2500L
    else if (sfDir.contains("sf0.01")) 250L
    else 25L

  /** Flagship: the near-dup clustering pipeline on the sf0.001-scale
    * synthetic corpus. */
  def entry(spark: SparkSession): DataFrame =
    DedupPipeline.run(CorpusGen.generate(spark, 25), cfg).toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational operator inventory (SURVEY §2, DuckDB-oracled) ---
    "q_agg_stats" -> ((s, d) => RelationalOps.aggStats(s, d)),
    "q_filter_project" -> ((s, d) => RelationalOps.filterProject(s, d)),
    "q_join_agg" -> ((s, d) => RelationalOps.joinAgg(s, d)),
    "q_anti_join" -> ((s, d) => RelationalOps.antiJoin(s, d)),
    "q_semi_join" -> ((s, d) => RelationalOps.semiJoin(s, d)),
    "q_topk_per_group" -> ((s, d) => RelationalOps.topKPerGroup(s, d)),
    "q_running_sum" -> ((s, d) => RelationalOps.runningSum(s, d)),
    "q_segment_fixed" -> ((s, d) => RelationalOps.segmentFixed(s, d)),
    "q_segment_content" -> ((s, d) => RelationalOps.segmentContentDefined(s, d)),
    "q_sample_mod" -> ((s, d) => RelationalOps.sampleMod(s, d)),
    "q_sample_uniform" -> ((s, d) => RelationalOps.sampleUniform(s, d)),
    "q_sample_optmin" -> ((s, d) => RelationalOps.sampleOptimizedMin(s, d)),
    "q_set_ops" -> ((s, d) => RelationalOps.setOps(s, d)),
    "q_quantile" -> ((s, d) => RelationalOps.quantile(s, d)),
    "q_cfl_stats" -> ((s, d) => RelationalOps.cflStats(s, d)),
    "q_event_windows" -> ((s, d) => RelationalOps.eventWindows(s, d)),
    "q_fifo_lists" -> ((s, d) => RelationalOps.fifoLists(s, d)),
    // --- text analysis / document dedup family ---
    "q_exact_dedup" -> ((s, d) => TextOps.exactDedup(s, d)),
    "q_dedup_stats" -> ((s, d) => TextOps.dedupStats(s, d)),
    "q_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "q_quality_score" -> ((s, d) => TextOps.qualityScore(s, d)),
    "q_doc_fingerprint" -> ((s, d) => TextOps.docFingerprint(s, d)),
    "q_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "q_substr_dups" -> ((s, d) => TextOps.substrDedup(s, d, cfg)),
    "q_substr_sa" -> ((s, d) => TextOps.substrDedupSA(s, d, cfg)),
    "q_cfl_rewrite" -> ((s, d) => TextOps.cflRewrite(s, d)),
    "q_har_sparse" -> ((s, d) => TextOps.harSparse(s, d)),
    "q_greedy_topk" -> ((s, d) => graft.ops.GreedySelect.greedyTopKDocs(s, d)),
    "q_trace_replay" -> ((s, d) => graft.sources.TraceSource.traceReplay(s, d)),
    "q_fsl_trace" -> ((s, d) => graft.sources.FslSource.fslReplay(s, d)),
    "q_trace_backup" -> ((s, d) => graft.sources.TraceSource.traceBackup(s, d)),
    "q_fsl_backup" -> ((s, d) => graft.sources.FslSource.fslBackup(s, d)),
    // --- byte-level CDC chunker family (P2-P6) over the documents table ---
    "q_chunk_fastcdc" -> ((s, d) => graft.ops.ChunkOps.chunkDocs(s, d, "fastcdc")),
    "q_chunk_cover" -> ((s, d) => graft.ops.ChunkOps.chunkCover(s, d)),
    "q_chunk_backup" -> ((s, d) => graft.ops.ChunkOps.chunkBackup(s, d)),
    "q_chunk_restore" -> ((s, d) => graft.ops.ChunkOps.chunkRestore(s, d)),
    // --- restore-cache simulations (T2/T3/T4/O5) + R6 + W2 ---
    "q_segment_recon" -> ((s, d) => RelationalOps.segmentReconstruct(s, d)),
    "q_restore_cache" -> ((s, d) => graft.ops.RestoreSim.restoreCacheQuery(s, d)),
    "q_cache_gate" -> ((s, d) => graft.ops.RestoreSim.cacheGate(s, d)),
    "q_cache_rewrite" -> ((s, d) => graft.ops.RestoreSim.cacheAwareRewriteQuery(s, d)),
    "q_minhash_dedup" -> ((s, d) => TextOps.minhashDedup(s, d, cfg)),
    "q_source_minhash" -> ((s, d) => TextOps.sourceMinhashDigest(s, d, cfg)),
    "q_simhash_dedup" -> ((s, d) => TextOps.simhashDedup(s, d)),
    // self-verifying gates (the q_recall_gate pattern): each compares
    // its rows-only sibling against an in-query exact oracle and emits
    // a constant verdict row, so the driver hash-checks the property
    "q_simhash_gate" -> ((s, d) => TextOps.simhashGate(s, d)),
    "q_ann_gate" -> ((s, d) => EmbedOps.annGate(s, d)),
    // bench-scale twin of q_ann_gate: exact ground truth only for a
    // hash-sample of queries (bounded oracle cost at ANY corpus size),
    // raised 0.85 floor — also run at sf0.1, see BENCH/BASELINE.md
    "q_ann_scale_gate" -> ((s, d) => EmbedOps.annScaleGate(s, d)),
    "q_ivf_gate" -> ((s, d) => EmbedOps.ivfGate(s, d)),
    "q_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccardDedup(s, d)),
    "q_ngram_exact" -> ((s, d) => TextOps.ngramJaccardExact(s, d)),
    "q_ngram_pruned" -> ((s, d) => TextOps.ngramJaccardPruned(s, d)),
    // --- embedding similarity search ---
    "q_embed_topk" -> ((s, d) => EmbedOps.cosineTopK(s, d)),
    "q_embed_ann" -> ((s, d) => EmbedOps.annTopK(s, d)),
    "q_nearest_centroid" -> ((s, d) => EmbedOps.nearestCentroid(s, d)),
    // rows-only by design (k-means codebook is not SQL-expressible);
    // exact oracle in IvfSpec: nprobe == nC reproduces q_embed_topk
    "q_ivf_topk" -> ((s, d) => EmbedOps.ivfTopK(s, d)),
    "q_embed_dups" -> ((s, d) => EmbedOps.cosineDups(s, d)),
    // rows-only by design (connected components is iterative); exact
    // union-find oracle + recall/precision gates in DocOpsSpec
    "q_embed_clusters" -> ((s, d) => EmbedOps.embedDedup(s, d)),
    // --- the image near-dup pipeline on the synthetic corpus ---
    "q_img_clusters" -> ((s, d) =>
      DedupPipeline.run(CorpusGen.generate(s, groupsFor(d)), cfg).toDF()),
    // restore/round-trip fidelity (T1/T2/T5): rebuild every row from
    // the content store and verify PSNR >= 40 dB + caption equality;
    // the invariant holds at ANY corpus size, so the oracle is the
    // constant zero-violations row.
    "q_roundtrip_verify" -> ((s, d) =>
      graft.pipeline.RestoreOps.roundTrip(CorpusGen.generate(s, groupsFor(d)), cfg)),
    // the BASELINE.json headline metric as a driver row: full pipeline
    // vs brute-force oracle on the planted corpus, verdict constants
    // (recall >= 0.99, precision 1.0) — fixed-size corpus (the oracle
    // is O(n²) by definition), so the oracle SQL is a literal.
    "q_recall_gate" -> ((s, _) => graft.synth.RecallGate.report(s, cfg)),
    "q_img_signatures" -> ((s, d) =>
      DedupPipeline.signatures(CorpusGen.generate(s, groupsFor(d)), cfg)
        .select(col("image_id"), col("sha"), col("simhash"), col("phash"), col("shingle_count"))),
    // video path end-to-end (frame sampling + decode + features): the
    // synthetic per-doc videos have closed-form luma/phash, so the
    // whole chain is DuckDB hash-oracled — see mediaFeatures scaladoc
    "q_media_features" -> ((s, d) =>
      graft.multimodal.BinaryPipeline.mediaFeatures(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    // HAR sparse-container list (A2/O4): same packing CTEs as
    // q_cfl_rewrite, then the ascending running-sum trim. sum(BIGINT)
    // is HUGEINT in DuckDB — cast back for schema parity.
    "q_har_sparse" ->
      """WITH canon AS (
        |  SELECT md5(text) AS k, min(doc_id) AS canonical_id FROM documents GROUP BY 1),
        |cr AS (
        |  SELECT c.canonical_id, d.source, d.n_chars
        |  FROM canon c JOIN documents d ON d.doc_id = c.canonical_id),
        |packed AS (
        |  SELECT source || '#' || CAST(CAST(floor(
        |      (sum(n_chars) OVER (PARTITION BY source ORDER BY canonical_id) - n_chars)
        |      / 4096) AS BIGINT) AS VARCHAR) AS container_id,
        |    n_chars
        |  FROM cr),
        |cont AS (
        |  SELECT container_id, CAST(sum(n_chars) AS BIGINT) AS size
        |  FROM packed GROUP BY 1),
        |tot AS (SELECT CAST(sum(size) AS DOUBLE) AS t FROM cont),
        |run AS (
        |  SELECT container_id, size,
        |    sum(size) OVER (ORDER BY size, container_id) AS cum
        |  FROM cont WHERE size / 4096.0 < 0.8)
        |SELECT container_id, size FROM run, tot
        |WHERE CAST(cum AS DOUBLE) <= 0.01 * t""".stripMargin,
    // U2 MinHash-merge UDAF: the query itself compares the UDAF result
    // against an independent posexplode+min recompute and emits the
    // scalar verdict, so the oracle is the constant merge_ok=1 per
    // source (same invariant-as-constant pattern as q_roundtrip_verify;
    // the raw array<bigint> column crashed the driver's pandas sort).
    "q_source_minhash" ->
      """SELECT source, count(*) AS n_docs, CAST(1 AS INTEGER) AS merge_ok
        |FROM documents GROUP BY 1""".stripMargin,
    // Trace round-trip (S2): the replayed per-stream stats must equal
    // the same stats computed directly from the source table (distinct
    // sha1 fp == distinct text).
    "q_trace_replay" ->
      """SELECT source, count(*) AS n_chunks,
        |  count(DISTINCT text) AS n_unique,
        |  CAST(sum(n_chars) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1""".stripMargin,
    // FSL hashfile round-trip (S3): one v7 binary hashfile per source
    // (200-char slices, md5 fingerprints), replayed through the binary
    // parser; DuckDB rebuilds the identical chunk set from `documents`.
    "q_fsl_trace" ->
      """WITH ch0 AS (
        |  SELECT source, doc_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(length(text)/200.0) AS BIGINT) - 1)) AS i
        |  FROM documents WHERE n_chars > 0),
        |ch AS (
        |  SELECT source, doc_id,
        |    md5(substring(text, CAST(i*200 + 1 AS INTEGER), 200)) AS fp,
        |    strlen(substring(text, CAST(i*200 + 1 AS INTEGER), 200)) AS sz
        |  FROM ch0)
        |SELECT source, count(*) AS n_chunks,
        |  count(DISTINCT doc_id) AS n_files,
        |  count(DISTINCT fp) AS n_unique,
        |  CAST(sum(sz) AS BIGINT) AS total_bytes,
        |  min(fp) AS min_fp, max(fp) AS max_fp
        |FROM ch GROUP BY 1""".stripMargin,
    // Trace-driven backup (destor's simulation-mode benchmark workflow):
    // global first-occurrence in trace order == first occurrence of each
    // text by (source, doc_id) — sha1 is collision-free on the corpus.
    // The trace corpus carries PLANTED cross-stream duplicates (every
    // doc_id % 7 == 0 replayed into the alphabetically-next source,
    // ordered after natives via the 2^40 doc_id offset) so the dedup
    // branch of the counters is live; the oracle derives the identical
    // planted set from `documents`.
    "q_trace_backup" ->
      """WITH srcs AS (
        |  SELECT source, row_number() OVER (ORDER BY source) AS i,
        |    count(*) OVER () AS n
        |  FROM (SELECT DISTINCT source FROM documents)),
        |plant AS (
        |  SELECT s2.source, d.doc_id + 1099511627776 AS doc_id,
        |    d.text, d.n_chars
        |  FROM documents d
        |  JOIN srcs s1 ON d.source = s1.source
        |  JOIN srcs s2 ON s2.i = (s1.i % s1.n) + 1
        |  WHERE d.doc_id % 7 = 0),
        |u AS (
        |  SELECT source, doc_id, text, n_chars FROM documents
        |  UNION ALL SELECT source, doc_id, text, n_chars FROM plant),
        |t AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY source, doc_id) AS rn
        |  FROM u)
        |SELECT source, count(*) AS n_chunks,
        |  CAST(sum(n_chars) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS stored_bytes,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_stored
        |FROM t GROUP BY 1""".stripMargin,
    // Trace-driven backup over the FSL grammar at slice grain: the
    // corpus has real duplicate slices, so the global-index dedup
    // decision is exercised end-to-end through the binary format.
    "q_fsl_backup" ->
      """WITH ch0 AS (
        |  SELECT source, doc_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(length(text)/200.0) AS BIGINT) - 1)) AS i
        |  FROM documents WHERE n_chars > 0),
        |ch AS (
        |  SELECT source, doc_id, i,
        |    md5(substring(text, CAST(i*200 + 1 AS INTEGER), 200)) AS fp,
        |    strlen(substring(text, CAST(i*200 + 1 AS INTEGER), 200)) AS sz
        |  FROM ch0),
        |t AS (
        |  SELECT source, sz,
        |    row_number() OVER (PARTITION BY fp ORDER BY source, doc_id, i) AS rn
        |  FROM ch)
        |SELECT source, count(*) AS n_chunks,
        |  CAST(sum(sz) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN rn = 1 THEN sz ELSE 0 END) AS BIGINT)
        |    AS stored_bytes,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_stored
        |FROM t GROUP BY 1""".stripMargin,
    // W2 segment reconstruction: identical token-stream construction +
    // running-count reconstruction on both engines.
    "q_segment_recon" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY 1),
        |tokens AS (
        |  SELECT user_id, rn*10+5 AS ord, 'chunk' AS kind, value FROM ev
        |  UNION ALL
        |  SELECT user_id, rn*10, 'seg_start', 0.0 FROM ev
        |    WHERE rn = 1 OR event_id % 7 = 0
        |  UNION ALL
        |  SELECT user_id, rn*10-1, 'seg_end', 0.0 FROM ev
        |    WHERE rn > 1 AND event_id % 7 = 0
        |  UNION ALL
        |  SELECT user_id, mxrn*10+9, 'seg_end', 0.0 FROM mx),
        |recon AS (
        |  SELECT user_id, kind, value,
        |    CAST(sum(CASE WHEN kind = 'seg_start' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ord) AS BIGINT) AS seg
        |  FROM tokens)
        |SELECT user_id, seg, count(*) AS n_chunks,
        |  round(sum(value), 2) AS seg_value
        |FROM recon WHERE kind = 'chunk' GROUP BY 1, 2""".stripMargin,
    // Restore-cache gate: paging-theory invariants as a constant verdict
    // row (Belady optimality, LRU stack property, coverage floors).
    "q_cache_gate" ->
      """SELECT count(DISTINCT source) AS n_streams,
        |  CAST(1 AS BIGINT) AS opt_le_lru_ok,
        |  CAST(1 AS BIGINT) AS lru_monotone_ok,
        |  CAST(1 AS BIGINT) AS window_ge_exact_ok,
        |  CAST(1 AS BIGINT) AS ge_distinct_ok,
        |  CAST(1 AS BIGINT) AS bigcache_exact_ok
        |FROM documents WHERE n_chars > 0""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | round(sum(l_discount),2) AS sum_disc
        |FROM lineitem GROUP BY 1,2""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice*(1-l_discount) AS net_price
        |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 10""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "q_running_sum" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_value
        |FROM events""".stripMargin,
    "q_segment_fixed" ->
      """WITH e AS (SELECT user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        | FROM events)
        |SELECT user_id, CAST((rn-1)//5 AS INTEGER) AS seg, count(*) AS n_events,
        | round(sum(value),2) AS seg_value
        |FROM e GROUP BY 1,2""".stripMargin,
    "q_segment_content" ->
      """WITH s AS (SELECT user_id,
        |  CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
        | FROM events)
        |SELECT user_id, seg, count(*) AS n_events FROM s GROUP BY 1,2""".stripMargin,
    "q_sample_mod" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE substr(md5(text),1,1) IN ('0','1')""".stripMargin,
    "q_sample_uniform" ->
      """WITH e AS (SELECT source, doc_id, md5(text) AS fp,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos
        | FROM documents)
        |SELECT source, doc_id, fp FROM e WHERE pos % 32 = 0""".stripMargin,
    "q_sample_optmin" ->
      """WITH e AS (SELECT source, doc_id, md5(text) AS fp,
        |   row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
        |   count(*) OVER (PARTITION BY source) AS n,
        |   coalesce(lag(md5(text), 8) OVER (PARTITION BY source ORDER BY doc_id),
        |            first_value(md5(text)) OVER (PARTITION BY source ORDER BY doc_id)) AS candidate
        | FROM documents),
        |f AS (SELECT *,
        |   CASE WHEN n > 32 THEN n // 32 + CASE WHEN (n % 32) * 2 > 32 THEN 1 ELSE 0 END
        |        ELSE 1 END AS feature_num,
        |   row_number() OVER (PARTITION BY source ORDER BY fp, doc_id) AS rk
        | FROM e)
        |SELECT DISTINCT source, candidate AS feature FROM f WHERE rk <= feature_num""".stripMargin,
    "q_lang_id" ->
      """WITH h AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('the','and','of','to','a','is','that'))) AS h_en,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('der','die','das','und','ist','nicht'))) AS h_de,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('le','la','les','et','est','une'))) AS h_fr,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('el','la','los','y','es','una'))) AS h_es,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('的','是','了','在'))) AS h_zh
        | FROM documents)
        |SELECT doc_id,
        |  list_sort([{'h':h_en,'l':'en'},{'h':h_de,'l':'de'},{'h':h_fr,'l':'fr'},
        |             {'h':h_es,'l':'es'},{'h':h_zh,'l':'zh'}])[-1].l AS lang_pred,
        |  CAST(h_en AS INTEGER) AS en_hits
        |FROM h""".stripMargin,
    "q_ngram_exact" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, substring(t, i, 3) AS gram
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, length(t) - 2)) AS i
        |        FROM d WHERE length(t) >= 3)),
        |c AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |sh AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, shared, c1.n + c2.n - shared AS union_sz
        |FROM sh JOIN c c1 ON sh.id1 = c1.doc_id
        |        JOIN c c2 ON sh.id2 = c2.doc_id
        |WHERE shared * 5 >= (c1.n + c2.n) * 2""".stripMargin,
    // df-pruned exact trigram Jaccard: the HAVING prune on posting
    // lists mirrors the engine's df filter EXACTLY; candidates come
    // only from surviving grams, scores recompute over FULL gram sets.
    "q_ngram_pruned" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, substring(t, i, 3) AS gram
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, length(t) - 2)) AS i
        |        FROM d WHERE length(t) >= 3)),
        |c AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |keep AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) <= 64),
        |k AS (SELECT g.doc_id, g.gram FROM g JOIN keep USING (gram)),
        |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |         FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id),
        |sh AS (
        |  SELECT cd.id1, cd.id2, count(*) AS shared
        |  FROM cand cd JOIN g ga ON ga.doc_id = cd.id1
        |               JOIN g gb ON gb.doc_id = cd.id2 AND gb.gram = ga.gram
        |  GROUP BY 1, 2)
        |SELECT id1, id2, shared, c1.n + c2.n - shared AS union_sz
        |FROM sh JOIN c c1 ON sh.id1 = c1.doc_id
        |        JOIN c c2 ON sh.id2 = c2.doc_id
        |WHERE shared * 5 >= (c1.n + c2.n) * 2""".stripMargin,
    "q_set_ops" ->
      """SELECT DISTINCT l_partkey AS partkey FROM lineitem
        |EXCEPT
        |SELECT p_partkey AS partkey FROM part WHERE p_size > 25""".stripMargin,
    "q_quantile" ->
      """SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5),4) AS median_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_cfl_stats" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS distinct_supp,
        | round(CAST(sum(l_quantity) AS DOUBLE)/100.0,2) AS ideal_units
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_event_windows" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n, round(sum(value),2) AS v
        |FROM events GROUP BY 1,2""".stripMargin,
    "q_fifo_lists" ->
      """SELECT user_id,
        | string_agg(event_type, ',' ORDER BY ts DESC, event_id DESC) AS types_newest_first
        |FROM events GROUP BY 1""".stripMargin,
    "q_exact_dedup" ->
      """SELECT md5(text) AS dup_key, min(doc_id) AS canonical_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q_dedup_stats" ->
      """SELECT
        | (SELECT count(*) FROM documents) AS total_docs,
        | (SELECT count(*) FROM (SELECT md5(text) FROM documents GROUP BY 1)) AS unique_docs,
        | (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS total_chars,
        | (SELECT CAST(sum(sz) AS BIGINT) FROM
        |   (SELECT min(n_chars) AS sz FROM documents GROUP BY md5(text))) AS unique_chars""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
        |FROM documents""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS n_chars2,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        | CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS INTEGER) AS n_alnum,
        | CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |   t -> t IN ('the','a','and','of','to','in','is'))) AS INTEGER) AS n_stopwords
        |FROM documents""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(
        |   string_split_regex(trim(text), '\s+'))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,
    // Substring-containment dups under the df-prune: the oracle mirrors
    // the ENGINE's portable winnowing selection exactly — md5 char-gram
    // hashes, window-min-of-w fingerprints over full windows only, and
    // the same HAVING df <= cap prune — so engine and oracle drop the
    // SAME boilerplate-hot fingerprints and the query stays both
    // hash-matched and bounded (the round-2 uncapped expander is gone).
    "q_substr_dups" ->
      s"""WITH d AS (
        |  SELECT doc_id, source, lower(text) AS t FROM documents
        |  WHERE length(lower(text)) >= ${cfg.substrMinChars}),
        |g AS (
        |  SELECT doc_id, source, i, md5(substring(t, i, ${cfg.substrGram})) AS gh
        |  FROM (SELECT doc_id, source, t,
        |          unnest(generate_series(1, length(t) - ${cfg.substrGram - 1})) AS i
        |        FROM d)),
        |w AS (
        |  SELECT doc_id, source, i,
        |    min(gh) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND ${cfg.substrWindow - 1} FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id) AS ng
        |  FROM g),
        |f AS (SELECT DISTINCT doc_id, source, fp FROM w
        |      WHERE i <= ng - ${cfg.substrWindow} + 1),
        |s AS (SELECT source, fp FROM f GROUP BY 1, 2
        |      HAVING count(*) <= ${cfg.substrDfCap}),
        |p AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |      FROM f a JOIN f b ON a.source = b.source AND a.fp = b.fp
        |        AND a.doc_id < b.doc_id
        |      JOIN s ON s.source = a.source AND s.fp = a.fp)
        |SELECT DISTINCT p.id1, p.id2
        |FROM p JOIN d da ON da.doc_id = p.id1 JOIN d db ON db.doc_id = p.id2
        |WHERE (contains(db.t, da.t) AND da.t <> db.t)
        |   OR (contains(da.t, db.t) AND da.t <> db.t)""".stripMargin,
    // Suffix-array exact containment: no fingerprints and no prune in
    // the engine (generalized SA per source shard), so the oracle is
    // the plain quadratic containment join — exactness is the point.
    "q_substr_sa" ->
      s"""WITH d AS (
        |  SELECT doc_id, source, lower(text) AS t FROM documents
        |  WHERE length(lower(text)) >= ${cfg.substrMinChars})
        |SELECT a.doc_id AS id1, b.doc_id AS id2
        |FROM d a JOIN d b
        |  ON a.source = b.source AND a.doc_id < b.doc_id AND a.t <> b.t
        |WHERE contains(a.t, b.t) OR contains(b.t, a.t)""".stripMargin,
    "q_cfl_rewrite" ->
      """WITH canon AS (
        |  SELECT md5(text) AS k, min(doc_id) AS canonical_id FROM documents GROUP BY 1),
        |cr AS (
        |  SELECT c.k, c.canonical_id, d.source, d.n_chars
        |  FROM canon c JOIN documents d ON d.doc_id = c.canonical_id),
        |packed AS (
        |  SELECT k, canonical_id AS content_id,
        |    source || '#' || CAST(CAST(floor(
        |      (sum(n_chars) OVER (PARTITION BY source ORDER BY canonical_id) - n_chars)
        |      / 4096) AS BIGINT) AS VARCHAR) AS container_id,
        |    n_chars AS content_bytes
        |  FROM cr),
        |refs AS (
        |  SELECT d.doc_id, p.content_id, p.container_id, p.content_bytes
        |  FROM documents d JOIN packed p ON md5(d.text) = p.k
        |  WHERE d.doc_id % 7 = 0),
        |util AS (
        |  SELECT container_id, sum(content_bytes)/4096.0 AS utilization
        |  FROM (SELECT DISTINCT content_id, container_id, content_bytes FROM refs)
        |  GROUP BY 1),
        |cfl AS (
        |  SELECT least(1.0, ceil(sum(content_bytes)/4096.0)
        |    / count(DISTINCT container_id)) AS v FROM refs)
        |SELECT r.doc_id, r.content_id, r.container_id,
        |  round(u.utilization, 4) AS util,
        |  CAST(((SELECT v FROM cfl) < 0.6 AND u.utilization < 0.25) AS INTEGER) AS ooo,
        |  CAST(((SELECT v FROM cfl) < 0.6 AND u.utilization < 0.25
        |        AND r.doc_id <> r.content_id) AS INTEGER) AS rewrite
        |FROM refs r JOIN util u USING (container_id)""".stripMargin,
    "q_roundtrip_verify" ->
      """SELECT CAST(0 AS BIGINT) AS psnr_violations,
        | CAST(0 AS BIGINT) AS caption_violations,
        | CAST(1 AS BIGINT) AS all_restored""".stripMargin,
    // recall gate: the in-query brute-force comparison makes the row a
    // self-verifying oracle (same invariant-as-constant pattern as
    // q_roundtrip_verify); 480 = the fixed 60-group planted corpus.
    "q_recall_gate" ->
      """SELECT CAST(480 AS BIGINT) AS n_images,
        | CAST(1 AS INTEGER) AS pairs_found,
        | CAST(1 AS INTEGER) AS recall_ok,
        | CAST(1 AS INTEGER) AS precision_ok""".stripMargin,
    // self-verifying gates: the in-query comparison against the exact
    // oracle makes each row a constant at any corpus size
    "q_simhash_gate" ->
      """SELECT CAST(1 AS INTEGER) AS pairs_found,
        | CAST(1 AS INTEGER) AS lsh_equals_brute""".stripMargin,
    "q_ann_gate" ->
      """SELECT CAST(1 AS INTEGER) AS pairs_found,
        | CAST(1 AS INTEGER) AS recall_ok""".stripMargin,
    "q_ann_scale_gate" ->
      """SELECT CAST(1 AS INTEGER) AS pairs_found,
        | CAST(1 AS INTEGER) AS recall_ok""".stripMargin,
    "q_ivf_gate" ->
      """SELECT CAST(1 AS INTEGER) AS pairs_found,
        | CAST(1 AS INTEGER) AS exact_match""".stripMargin,
    "q_embed_topk" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        | FROM e a, e b WHERE a.vec_id <> b.vec_id)
        |SELECT vec_id, neighbor_id, CAST(rk AS INTEGER) AS rk, cos FROM (
        | SELECT *, row_number() OVER (PARTITION BY vec_id
        |   ORDER BY cos DESC, neighbor_id) AS rk FROM p) WHERE rk <= 5""".stripMargin,
    // Embedding-cosine near-dup pairs: same list_cosine_similarity +
    // round-6 parity as q_embed_topk, thresholded on the ROUNDED score
    // exactly as the engine does.
    "q_embed_dups" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
        | FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, cos FROM p WHERE cos >= 0.35""".stripMargin,
    // Same list_cosine_similarity parity trick as q_embed_topk; the
    // per-label centroid is a plain per-dimension mean, and the
    // round-6 + min-label tie-break makes the argmax engine-stable.
    "q_nearest_centroid" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |ex AS (SELECT label, unnest(v) AS x,
        |  unnest(range(1, len(v)+1)) AS pos FROM e),
        |cm AS (SELECT label AS c_label, pos, avg(x) AS m FROM ex GROUP BY 1, 2),
        |c AS (SELECT c_label, list(m ORDER BY pos) AS centroid FROM cm GROUP BY 1),
        |s AS (SELECT e.vec_id, e.label, c.c_label,
        |  round(list_cosine_similarity(e.v, c.centroid), 6) AS cos FROM e, c)
        |SELECT vec_id, label, c_label AS nearest_label FROM (
        | SELECT *, row_number() OVER (PARTITION BY vec_id
        |   ORDER BY cos DESC, c_label) AS rk FROM s) WHERE rk = 1""".stripMargin,
    // CDC chunker tiling contract (P2-P6): every algorithm must tile
    // each document exactly (sum of chunk lengths = UTF-8 byte length,
    // contiguous cover, min/max clamps) — DuckDB states the expected
    // invariant row per (doc, algo), so a single dropped/overlapping
    // chunk anywhere in any chunker hash-mismatches.
    // chunk-granularity restore (T1/T2/T5 over byte streams): every
    // chunk fetched from the store must reproduce its slice exactly —
    // the expected report is a constant, same pattern as
    // q_roundtrip_verify.
    "q_chunk_restore" ->
      """SELECT CAST(0 AS BIGINT) AS missing_chunks,
        | CAST(0 AS BIGINT) AS byte_mismatches,
        | CAST(1 AS BIGINT) AS all_restored""".stripMargin,
    // Video features: mirrors mediaFeatures' closed forms — sampled
    // frame indices (stride 2 of 1 + doc_id % 5 frames), per-frame mean
    // luma c + 7.5*(sy+sx), and the 8x8 average-hash bit grid
    // sy*(2*by-7) + sx*(2*bx-7) > 0 packed into a BIGINT (bit 63 never
    // set by construction: sy + sx < 0).
    "q_media_features" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 5 AS BIGINT), 2)) AS i
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, i,
        |    105 + (doc_id * 37 + i * 11) % 32 AS c,
        |    CASE (doc_id + i) % 8
        |      WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN -1
        |      WHEN 4 THEN -1 WHEN 5 THEN -3 WHEN 6 THEN -3 ELSE 3 END AS sy,
        |    CASE (doc_id + i) % 8
        |      WHEN 0 THEN -2 WHEN 1 THEN -4 WHEN 2 THEN -4 WHEN 3 THEN -2
        |      WHEN 4 THEN -4 WHEN 5 THEN -2 WHEN 6 THEN -4 ELSE -6 END AS sx
        |  FROM f),
        |cells AS (
        |  SELECT p.doc_id, p.i, by.v AS by, bx.v AS bx,
        |    p.sy * (2 * by.v - 7) + p.sx * (2 * bx.v - 7) AS diff
        |  FROM p,
        |    (SELECT unnest(generate_series(0, 7)) AS v) by,
        |    (SELECT unnest(generate_series(0, 7)) AS v) bx),
        |ph AS (
        |  SELECT doc_id, i,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(by * 8 + bx AS INTEGER))
        |      AS BIGINT) AS phash
        |  FROM cells WHERE diff > 0 GROUP BY 1, 2),
        |fr AS (
        |  SELECT p.doc_id, p.c + 7.5 * (p.sy + p.sx) AS luma, ph.phash
        |  FROM p JOIN ph ON p.doc_id = ph.doc_id AND p.i = ph.i)
        |SELECT 'vid_' || CAST(doc_id AS VARCHAR) AS image_id,
        |  count(*) AS n_frames,
        |  round(avg(luma), 3) AS mean_luma,
        |  min(phash) AS min_phash, max(phash) AS max_phash
        |FROM fr GROUP BY 1""".stripMargin,
    "q_chunk_cover" ->
      """SELECT d.doc_id, a.algo,
        |  CAST(octet_length(encode(d.text)) AS BIGINT) AS total_len,
        |  TRUE AS cover_ok, TRUE AS clamps_ok
        |FROM documents d
        |CROSS JOIN (SELECT unnest(['ae','fastcdc','rabin','rabin_norm','tttd']) AS algo) a""".stripMargin
  )
}
