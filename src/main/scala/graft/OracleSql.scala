package graft

/** DuckDB-1.0.0 oracle SQL — one entry per oracle-checkable query in
  * Queries.scala, replaying the exact same computation (same hash functions,
  * same fold orders, same floor/decimal determinism discipline; see the
  * Queries scaladoc). The remaining probes without an entry here are the
  * structurally non-replayable ones (approximate ANN, streaming, binary
  * file ingest, learned-vocabulary tf-idf) — the driver records a
  * rows-only check for those.
  *
  * Portability notes baked in:
  *   - regexp_replace carries the 'g' flag (Spark replaces all by default);
  *   - md5-as-integer = ('0x' || substr(md5(x),1,15))::BIGINT
  *     ≡ Spark conv(substring(md5(x),1,15),16,10)::long  (60 bits, positive);
  *   - epoch_us(ts) ≡ Spark unix_micros (ns → µs truncation identical);
  *   - per-row sizes cast to INT (DuckDB len() is BIGINT, Spark size() is
  *     INT); whole-column sums cast to BIGINT (DuckDB sums ints to HUGEINT).
  */
object OracleSql {

  private val toks =
    raw"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')"

  /** Morton interleave of two 8-bit grid coords (q98) — generated from the
    * same (bit, column) loop as Layout.zValue so the two spellings cannot
    * drift: bit b of column i → output position b*2+i.
    */
  private val zTerms2x8: String =
    (for { b <- 0 until 8; (c, i) <- Seq("px", "sx").zipWithIndex }
      yield s"((($c >> $b) & 1) << ${b * 2 + i})").mkString(" | ")

  /** q101 split thresholds — the same cumulative-weight × 2^60 truncation
    * Sampling.assignSplit performs (0.8, then 0.8+0.1 in DOUBLE).
    */
  private val splitT1: Long = (0.8 * math.pow(2.0, 60)).toLong
  private val splitT2: Long = ((0.8 + 0.1) * math.pow(2.0, 60)).toLong

  /** q112 hyperplane weights — generated from the SAME function the Spark
    * operator uses (Search.seededLshWeight), so the two spellings cannot
    * drift: (table, bit, dim-index, ±1) rows for 4 tables × 8 bits × 64
    * dims.
    */
  private val lshWeights: String =
    (for { t <- 0 until 4; k <- 0 until 8; i <- 0 until 64 }
      yield s"($t,$k,$i,${graft.operators.Search.seededLshWeight(t, k, i)})")
      .mkString(",")

  /** q47's stopword list — the exact MLlib english default the Spark
    * pipeline's StopWordsRemover applies, embedded as VALUES rows.
    */
  private val stopWords: String =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english")
      .map(w => "('" + w.replace("'", "''") + "')").mkString(",")

  /** Seeded deterministic LSH replay (q112, and q119's persisted-index
    * path — build + append ≡ full build, so ONE oracle serves both): the
    * q75 int8 quantization, ±1 md5-parity hyperplanes (generated from
    * Search.seededLshWeight — one source of truth), 4 tables × 8 sign
    * bits → integer band buckets, distinct candidate pairs, exact
    * quantized-cosine ≥ 0.3 verification.
    */
  private lazy val seededLshSql: String =
    raw"""WITH wt(t,k,i,w) AS (VALUES $lshWeights),
sc AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
  FROM embeddings),
c AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)) END AS codes
  FROM sc),
proj AS (
  SELECT c.vec_id, wt.t, wt.k, sum(codes[wt.i + 1] * wt.w) AS p
  FROM c, wt GROUP BY c.vec_id, wt.t, wt.k),
bk AS (
  SELECT vec_id, t, sum(CASE WHEN p >= 0 THEN 1 << k ELSE 0 END) AS b
  FROM proj GROUP BY vec_id, t),
cand AS (
  SELECT DISTINCT a.vec_id AS id1, b2.vec_id AS id2
  FROM bk a JOIN bk b2 ON a.t = b2.t AND a.b = b2.b AND a.vec_id < b2.vec_id),
ver AS (
  SELECT cand.id1, cand.id2,
    list_inner_product(c1.codes, c2.codes) AS dp,
    list_inner_product(c1.codes, c1.codes) AS n1,
    list_inner_product(c2.codes, c2.codes) AS n2
  FROM cand
  JOIN c c1 ON c1.vec_id = cand.id1
  JOIN c c2 ON c2.vec_id = cand.id2)
SELECT id1, id2,
  floor(1000 * dp / (sqrt(n1) * sqrt(n2))) / 1 AS cos8_m
FROM ver
WHERE n1 > 0 AND n2 > 0 AND dp / (sqrt(n1) * sqrt(n2)) >= 0.3
ORDER BY id1, id2"""

  /** Exact heavy hitters over the full synthetic item stream (q114 via
    * the live store, q120 via the COMPACTED store — the exact-count
    * verify semi-join makes both paths exact, so ONE oracle serves both).
    */
  private val heavyHittersSql: String =
    raw"""WITH it AS (
  SELECT CASE WHEN event_id % 4 < 3 THEN 'hot_' || (event_id % 8)
              ELSE 'cold_' || event_id END AS item
  FROM events),
tot AS (SELECT count(*) AS n FROM it)
SELECT item, count(*) AS n_events
FROM it, tot GROUP BY item, tot.n
HAVING count(*) >= tot.n // 100
ORDER BY item"""

  /** q48's full minhash→LSH→Jaccard→closure replay, shared verbatim with
    * q154 (which extends the same CTE chain with weights) so the two
    * spellings cannot drift.
    */
  private val q48NeardupClustersSql: String =
    raw"""WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substring(text, 1, 300) AS text FROM documents WHERE doc_id < 60),
tk AS (SELECT doc_id, $toks AS tk FROM docs),
sh0 AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk),
shf AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 11),
      s -> list_min(list_transform(sh, x -> ('0x' || substr(md5(s::VARCHAR || '|' || x), 1, 15))::BIGINT))) AS sig
  FROM shf),
banded AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(0, 3),
      b -> concat_ws(',', b::VARCHAR || ':',
        array_to_string(list_transform(sig[b*3+1:b*3+3], v -> v::VARCHAR), ',')))) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
pairs AS (
  SELECT c.id1, c.id2
  FROM cand c JOIN shf x ON x.doc_id = c.id1 JOIN shf y ON y.doc_id = c.id2
  WHERE len(list_intersect(x.sh, y.sh)) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.4),
edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id)
SELECT id, min(label) AS rep FROM reach GROUP BY id ORDER BY id"""

  /** q154/q155's shared extension of the q48 CTEs: singleton assignment
    * via left join + rep counts (cluster sizes). Built from
    * [[q48NeardupClustersSql]]'s prefix so none of the three spellings
    * can drift.
    */
  private val softDedupWeightsCtes: String =
    q48NeardupClustersSql.substring(0,
        q48NeardupClustersSql.lastIndexOf("SELECT id, min(label)")) +
      raw""",
clusters AS (SELECT id, min(label) AS rep FROM reach GROUP BY id),
assigned AS (
  SELECT d.doc_id, coalesce(c.rep, d.doc_id) AS rep
  FROM docs d LEFT JOIN clusters c ON d.doc_id = c.id),
sizes AS (SELECT rep, count(*) AS cluster_size FROM assigned GROUP BY rep)"""

  /** The full q154 text, shared VERBATIM with q156: the incremental
    * update probe's oracle is the fresh recompute over the union corpus
    * — DuckDB never sees the incremental path, so the hash match proves
    * update ≡ fresh build cross-engine.
    */
  private val softDedupWeightsSql: String =
    softDedupWeightsCtes + raw"""
SELECT a.doc_id, a.rep, CAST(s.cluster_size AS BIGINT) AS cluster_size,
  CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
FROM assigned a JOIN sizes s ON a.rep = s.rep
ORDER BY a.doc_id"""

  private val base: Map[String, String] = Map(
    "q01_pricing_summary" ->
      raw"""SELECT l_returnflag, l_linestatus,
round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_disc_price,
floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100) / 100 AS avg_qty,
floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 100) / 100 AS avg_price,
count(*) AS n_items
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_mktsegment_revenue" ->
      raw"""SELECT c_mktsegment,
round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q03_region_customers" ->
      raw"""SELECT r_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name""",

    "q04_customer_orders_outer" ->
      raw"""SELECT c_custkey, count(o_orderkey) AS n_orders,
round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey""",

    "q05_big_spenders_semi" ->
      raw"""SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey""",

    "q06_no_events_anti" ->
      raw"""SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
ORDER BY c_custkey""",

    "q07_events_range_join" ->
      raw"""WITH ev AS (SELECT *, epoch_us(ts) AS us FROM events)
SELECT e.event_id AS err_id, count(*) AS n_nearby,
round(CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM ev e JOIN ev p ON p.event_type = 'purchase'
  AND p.us >= e.us - 300000000 AND p.us <= e.us + 300000000
WHERE e.event_type = 'error' AND e.user_id < 10
GROUP BY e.event_id ORDER BY err_id""",

    "q08_asof_purchase_view" ->
      raw"""WITH ev AS (SELECT *, epoch_us(ts) AS us FROM events),
u AS (
  SELECT user_id, us, 0 AS is_q, NULL::BIGINT AS event_id, value FROM ev WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, us, 1 AS is_q, event_id, NULL::DOUBLE AS value FROM ev
  WHERE event_type = 'purchase' AND user_id < 20)
SELECT event_id, user_id, asof_value FROM (
  SELECT user_id, is_q, event_id,
    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, is_q, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
  FROM u)
WHERE is_q = 1 AND asof_value IS NOT NULL ORDER BY event_id""",

    "q09_setops" ->
      raw"""SELECT
(SELECT count(DISTINCT user_id) FROM events) AS n_users,
(SELECT count(*) FROM (SELECT DISTINCT user_id FROM events INTERSECT SELECT DISTINCT c_custkey FROM customer)) AS n_common,
(SELECT count(*) FROM (SELECT user_id FROM events UNION SELECT c_custkey FROM customer)) AS n_union,
(SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer EXCEPT SELECT DISTINCT user_id FROM events)) AS n_cust_only""",

    "q10_rollup_region_nation" ->
      raw"""SELECT coalesce(r_name, '(all)') AS region, coalesce(n_name, '(all)') AS nation,
count(*) AS n_customers,
CAST(grouping(r_name) AS INT) AS g_region, CAST(grouping(n_name) AS INT) AS g_nation
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""",

    "q11_top_orders_per_customer" ->
      raw"""SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders)
WHERE rank <= 3 ORDER BY o_custkey, rank""",

    "q12_clean_text" ->
      raw"""WITH m AS (
  SELECT doc_id,
    '  ' || text || chr(9) || chr(9) || ' x  y ' || chr(160) || 'z'
      || chr(10) || chr(10) || chr(10) || chr(10) || 'end  ' AS messy
  FROM documents),
c AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(messy, chr(160), ' ', 'g'),
          '[ \t]+', ' ', 'g'),
        '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS cleaned
  FROM m)
SELECT doc_id, CAST(length(cleaned) AS INT) AS clean_len, substr(cleaned, 1, 40) AS head40
FROM c WHERE length(cleaned) > 0 ORDER BY doc_id""",

    "q13_fixed_chunker" ->
      raw"""WITH wins AS (
  SELECT doc_id, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 21, 0) / 100) AS BIGINT))) AS i
  FROM documents),
chunks AS (
  SELECT doc_id,
    regexp_replace(substring(text, CAST(i * 100 + 1 AS INT), 120), '^\s+|\s+$$', '', 'g') AS chunk_text
  FROM wins)
SELECT doc_id, count(*) AS n_chunks, CAST(sum(length(chunk_text)) AS BIGINT) AS sum_len
FROM chunks WHERE length(chunk_text) > 0
GROUP BY doc_id ORDER BY doc_id""",

    "q14_paragraph_chunks" ->
      raw"""SELECT doc_id,
CAST(len(list_filter(
  string_split_regex(regexp_replace(text, ' (table|row) ', chr(10) || chr(10), 'g'), '\n\s*\n'),
  p -> length(regexp_replace(p, '^\s+|\s+$$', '', 'g')) > 0)) AS INT) AS n_paras
FROM documents ORDER BY doc_id""",

    "q15_cosine_topk" ->
      raw"""SELECT e.vec_id,
floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])) / 1000 AS cos_sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id
LIMIT 5""",

    "q16_inner_product_label" ->
      raw"""SELECT a.label, count(*) AS n_pairs,
floor(1000 * max(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))) / 1000 AS max_ip
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
GROUP BY a.label ORDER BY a.label""",

    "q17_running_sum" ->
      raw"""SELECT user_id, CAST(rn AS INT) AS rn, event_id,
round(CAST(run_dec AS DOUBLE), 2) AS run_sum
FROM (
  SELECT user_id, event_id,
    row_number() OVER w AS rn,
    sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_dec
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
WHERE rn <= 3 ORDER BY user_id, rn""",

    "q18_hourly_tumbling" ->
      raw"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""",

    "q19_json_extract" ->
      raw"""SELECT event_type,
CAST(sum(CAST(json_extract_string(props, '$$.k') AS INT)) AS BIGINT) AS sum_k,
count(CAST(json_extract_string(props, '$$.k') AS INT)) AS n_with_k
FROM events GROUP BY event_type ORDER BY event_type""",

    "q20_exact_dup_triples" ->
      raw"""SELECT user_id, event_type, value, count(*) AS n_dups
FROM events GROUP BY user_id, event_type, value HAVING count(*) > 1
ORDER BY user_id, event_type, value""",

    "q21_minhash_neardup" ->
      raw"""WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substring(text, 1, 300) AS text FROM documents WHERE doc_id < 60),
tk AS (SELECT doc_id, $toks AS tk FROM docs),
sh0 AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk),
shf AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 11),
      s -> list_min(list_transform(sh, x -> ('0x' || substr(md5(s::VARCHAR || '|' || x), 1, 15))::BIGINT))) AS sig
  FROM shf),
banded AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(0, 3),
      b -> concat_ws(',', b::VARCHAR || ':',
        array_to_string(list_transform(sig[b*3+1:b*3+3], v -> v::VARCHAR), ',')))) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
scored AS (
  SELECT c.id1, c.id2,
    len(list_intersect(x.sh, y.sh)) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS j
  FROM cand c JOIN shf x ON x.doc_id = c.id1 JOIN shf y ON y.doc_id = c.id2)
SELECT id1, id2, floor(j * 1000) / 1 AS jaccard_m FROM scored WHERE j >= 0.4
ORDER BY id1, id2""",

    "q22_simhash" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 100),
hs AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs FROM tk)
SELECT doc_id,
CAST(list_sum(list_transform(generate_series(0, 15),
  i -> CASE WHEN 2 * len(list_filter(hs, h -> (h & (1::BIGINT << i)) <> 0)) - len(hs) > 0
            THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS simhash16
FROM hs ORDER BY doc_id""",

    "q23_jaccard_pairs" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 20),
sh AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk)
SELECT a.doc_id AS id1, b.doc_id AS id2,
floor(1000 * (len(list_intersect(a.sh, b.sh)) / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))) / 1 AS jaccard_m
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY id1, id2""",

    "q24_embedding_neardup" ->
      raw"""SELECT a.vec_id AS id1, b.vec_id AS id2,
floor(100 * list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])) / 1 AS cos_sim_c
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
ORDER BY id1, id2""",

    "q25_langid" ->
      raw"""WITH tk AS (SELECT lang, $toks AS tk FROM documents),
r AS (
  SELECT lang,
    CASE WHEN len(tk) = 0 THEN 0.0 ELSE len(list_intersect(tk, ['the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','be','this'])) / len(tk) END AS r_en,
    CASE WHEN len(tk) = 0 THEN 0.0 ELSE len(list_intersect(tk, ['der','die','das','und','ist','nicht','ein','eine','zu','mit','auf','für','von','im','den'])) / len(tk) END AS r_de,
    CASE WHEN len(tk) = 0 THEN 0.0 ELSE len(list_intersect(tk, ['le','la','les','et','est','un','une','de','des','du','pas','pour','dans','que','qui'])) / len(tk) END AS r_fr
  FROM tk)
SELECT lang,
CASE WHEN greatest(r_en, r_de, r_fr) = 0 THEN 'und'
     WHEN r_fr >= r_en AND r_fr >= r_de THEN 'fr'
     WHEN r_en >= r_de THEN 'en'
     ELSE 'de' END AS lang_id,
count(*) AS n
FROM r GROUP BY 1, 2 ORDER BY lang, lang_id""",

    "q26_event_type_sets" ->
      raw"""SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
count(*) AS n_events
FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id""",

    "q27_token_counts" ->
      raw"""WITH s AS (SELECT doc_id, text, regexp_replace(text, '^\s+|\s+$$', '', 'g') AS st FROM documents)
SELECT doc_id,
CASE WHEN length(st) = 0 THEN 0 ELSE CAST(len(string_split_regex(st, '\s+')) AS INT) END AS word_cnt,
CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_cnt,
CAST(length(text) AS INT) AS n_chars_q
FROM s ORDER BY doc_id""",

    "q28_fingerprint" ->
      raw"""SELECT doc_id, substr(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 16) AS fp16
FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "q29_centroids" ->
      raw"""SELECT label, CAST(i AS INT) AS pos,
floor(1000000 * (CAST(sum(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / count(*))) / 1000000 AS centroid_v
FROM (SELECT label, embedding, unnest(generate_series(0, 63)) AS i FROM embeddings)
GROUP BY label, i ORDER BY label, pos""",

    // the TYPED QuantizedCentroidAggregator (q44): per-dim sums of
    // DECIMAL(18,9)-quantized floats as exact integers + group count —
    // the decimal quantization is the same cast q29 already pins cross-
    // engine; everything after it is integer arithmetic.
    // q43's bounded-pass oracle (VERDICT r18 item 5): DuckDB cannot run
    // MLlib's RP-LSH, but it CAN census the exact pairs at the same radius
    // — the real half of the probe's row. The recall verdict replays as a
    // literal TRUE: the Spark side computes recall against its own exact
    // leg and emits false whenever the frozen 0.90 floor is broken, so a
    // quality regression hash-mismatches this row. No per-sf literals —
    // the same SQL is green at every fixture scale.
    "q43_lsh_ann" ->
      raw"""SELECT count(*)::BIGINT AS exact_pairs,
TRUE AS lsh_recall_ge_floor, 900000::BIGINT AS recall_floor_u
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) <= 1.18""",

    "q44_centroid_typed" ->
      raw"""SELECT label, CAST(i AS INT) AS pos,
CAST(sum(CAST(CAST(CAST(embedding[i+1] AS DOUBLE) AS DECIMAL(18,9)) * 1000000000 AS BIGINT)) AS BIGINT) AS sum_u,
count(*) AS n
FROM (SELECT label, embedding, unnest(generate_series(0, 63)) AS i FROM embeddings)
GROUP BY label, i ORDER BY label, pos""",

    "q30_ivf_ann" ->
      raw"""WITH cents AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cid AS cluster_id, embedding FROM (
    SELECT e.vec_id, c.cid, e.embedding,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cents c)
  WHERE rn = 1),
q AS (SELECT cluster_id AS qc, embedding AS qv FROM assigned WHERE vec_id = 0)
SELECT a.vec_id, a.cluster_id,
floor(1000 * list_cosine_similarity(a.embedding::DOUBLE[], q.qv::DOUBLE[])) / 1000 AS cos_sim
FROM assigned a, q WHERE a.cluster_id = q.qc AND a.vec_id <> 0
ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, a.vec_id
LIMIT 5""",

    "q31_math_funcs" ->
      raw"""SELECT p_brand,
floor(CAST(sum(CAST(sqrt(p_retailprice) AS DECIMAL(18,6))) AS DOUBLE) * 100) / 100 AS sum_sqrt_price,
least(min(p_size), 10) AS min_size_c,
greatest(max(p_size), 40) AS max_size_c,
CAST(sum(abs(p_size - 25)) AS BIGINT) AS sum_absdev,
count(*) AS n
FROM part GROUP BY p_brand ORDER BY p_brand""",

    "q32_quality_score" ->
      raw"""WITH tk AS (SELECT doc_id, text, $toks AS tk FROM documents WHERE doc_id < 200),
c AS (
  SELECT doc_id,
    least(length(text) / 500.0, 1.0) AS len_score,
    least((CASE WHEN len(tk) = 0 THEN 0.0 ELSE len(list_intersect(tk, ['the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','be','this'])) / len(tk) END) * 4.0, 1.0) AS stop_score,
    1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE (length(text) - length(regexp_replace(text, '[\p{P}]', '', 'g'))) / length(text) END) * 4.0, 1.0) AS punct_score,
    CASE WHEN (CASE WHEN len(tk) = 0 THEN 0.0 ELSE list_sum(list_transform(tk, t -> length(t))) / len(tk) END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END AS word_score
  FROM tk)
SELECT doc_id,
floor(10000 * (len_score * 0.3 + stop_score * 0.3 + punct_score * 0.2 + word_score * 0.2)) / 10000 AS quality
FROM c ORDER BY doc_id""",

    "q33_strings" ->
      raw"""SELECT c_custkey, upper(c_name) AS name_upper,
concat_ws('-', lower(substr(c_name, 1, 8)), lpad(CAST(c_custkey AS VARCHAR), 6, '0')) AS name_code,
CAST(length(c_name) AS INT) AS name_len
FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""",

    "q34_sessions" ->
      raw"""WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us, epoch_ms(ts) AS ms
  FROM events WHERE user_id < 10),
flagged AS (
  SELECT *, CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 300000000
                 THEN 1 ELSE 0 END AS new_s
  FROM e),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged)
SELECT user_id, CAST(min(ms) AS BIGINT) AS session_start_ms, count(*) AS n,
round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM sess GROUP BY user_id, sess_id ORDER BY user_id, session_start_ms""",

    "q35_exact_dedup_keepmin" ->
      raw"""SELECT min(event_id) AS kept_id FROM events
GROUP BY user_id, event_type, value ORDER BY kept_id""",

    "q36_lag_lead" ->
      raw"""SELECT user_id, CAST(rn AS INT) AS rn,
CAST(dv AS DOUBLE) AS delta, coalesce(nt, '(none)') AS next_type
FROM (
  SELECT user_id, row_number() OVER w AS rn,
    CAST(value AS DECIMAL(18,2)) - lag(CAST(value AS DECIMAL(18,2)), 1) OVER w AS dv,
    lead(event_type, 1) OVER w AS nt
  FROM events WHERE user_id < 20
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
WHERE rn <= 5 ORDER BY user_id, rn""",

    "q37_cube" ->
      raw"""SELECT coalesce(event_type, '(all)') AS event_type,
coalesce(user_bucket, -1) AS user_bucket, count(*) AS n,
CAST(grouping(event_type) AS INT) AS g_type,
CAST(grouping(user_bucket) AS INT) AS g_bucket
FROM (SELECT event_type, CAST(user_id % 10 AS INT) AS user_bucket FROM events)
GROUP BY CUBE(event_type, user_bucket)
ORDER BY event_type, user_bucket, g_type, g_bucket""",

    "q38_ntile" ->
      raw"""SELECT CAST(quartile AS INT) AS quartile, count(*) AS n,
min(value) AS min_value, max(value) AS max_value
FROM (
  SELECT value, ntile(4) OVER (ORDER BY value, event_id) AS quartile
  FROM events WHERE user_id < 50)
GROUP BY quartile ORDER BY quartile""",

    "q39_dates" ->
      raw"""SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
count(*) AS n_orders,
round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM orders GROUP BY 1, 2 ORDER BY yr, mo""",

    // salting is an execution-strategy change only — the plain join is the oracle
    "q46_salted_join" ->
      raw"""SELECT c_mktsegment, count(*) AS n_events,
round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // cluster representative = min reachable id over the undirected pair
    // graph; recursive CTE closure (clusters are tiny) vs Spark's iterative
    // min-label propagation
    "q48_neardup_clusters" -> q48NeardupClustersSql,

    // Soft-dedup weights (q154): the q48 closure CTEs VERBATIM (generated
    // from the same string — the zTerms2x8 no-drift discipline), extended
    // with singleton assignment, rep counts and the integer ppm weight.
    "q154_soft_dedup_weights" -> softDedupWeightsSql,

    // Incremental soft-dedup weights (q156): SAME SQL as q154 — the
    // oracle recomputes from the union corpus, never seeing the
    // incremental path; the hash match proves update ≡ fresh build.
    "q156_incremental_soft_dedup_weights" -> softDedupWeightsSql,

    // Streaming soft-dedup weights store (q157): SAME SQL again — the
    // oracle never sees the patch-store lifecycle (durable pairs →
    // O(change) patches → latest-wins read), so the hash match proves
    // the store serves exactly the fresh-build table.
    "q157_streaming_soft_dedup_weights" -> softDedupWeightsSql,

    // Weighted token rebalance (q159): the q154 weight CTEs VERBATIM
    // (same shared string), token counts reuse the chain's own tk CTE,
    // the per-doc multiply is integer `//` both sides, and the threshold
    // arithmetic is q79's spelling applied to the ADJUSTED masses.
    "q159_weighted_token_rebalance" ->
      (softDedupWeightsCtes + raw""",
tkc AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n FROM tk),
wt AS (
  SELECT a.doc_id, CAST(a.doc_id % 3 AS VARCHAR) AS grp,
    (t.n * CAST(1000000 // s.cluster_size AS BIGINT)) // 1000000 AS w_tok
  FROM assigned a JOIN sizes s ON a.rep = s.rep
  JOIN tkc t ON t.doc_id = a.doc_id),
g AS (SELECT grp, CAST(sum(w_tok) AS BIGINT) AS tg FROM wt GROUP BY grp),
tgt AS (SELECT * FROM (VALUES ('0', 0.5), ('1', 0.3), ('2', 0.2)) s(grp, share)),
m AS (
  SELECT min(g.tg::DOUBLE / tgt.share) AS m
  FROM g JOIN tgt USING (grp) WHERE g.tg > 0),
th AS (
  SELECT g.grp,
    CAST(floor(least(1.0, m.m * tgt.share / g.tg::DOUBLE) * 1152921504606846976) AS BIGINT) AS thr
  FROM g JOIN tgt USING (grp), m WHERE g.tg > 0),
kept AS (
  SELECT wt.grp, wt.w_tok FROM wt JOIN th USING (grp)
  WHERE ('0x' || substr(md5('wmix' || wt.doc_id::VARCHAR), 1, 15))::BIGINT < th.thr)
SELECT grp, count(*) AS n_kept, CAST(sum(w_tok) AS BIGINT) AS wtokens_kept
FROM kept GROUP BY grp ORDER BY grp"""),

    // Capstone curation pipeline (q160): all eight stages replayed in one
    // CTE chain — corpus construct (line synthesis + marker-planted
    // copies), the q88 Gopher + trigram-LM gates, q82's line dedup over
    // the survivors, q48/q154's minhash→closure→weights at threshold 0.3,
    // q71's 8-gram contamination screen vs the raw doc_id<5 bench, q94's
    // temperature thresholds over DEDUP-ADJUSTED token mass, q73's
    // first-fit pack recursion, q113's shuffle rank. Sentinel/coalesce
    // types mirror the Spark provenance row exactly (INT flags, BIGINT
    // masses/ids/ranks).
    "q160_curation_pipeline" ->
      raw"""WITH RECURSIVE raw0 AS MATERIALIZED (
  SELECT doc_id, lang, regexp_replace(text, ' (table|row) ', chr(10), 'g') AS text
  FROM documents),
planted AS (
  SELECT doc_id + off AS doc_id, lang,
    mk || replace(regexp_replace(text, ' (table|row) ', chr(10), 'g'),
                  chr(10), chr(10) || mk) AS text
  FROM (
    SELECT doc_id, lang, text,
      array_to_string(list_transform(generate_series(1, 6), k ->
        CASE substr((doc_id + o.off)::VARCHAR, k, 1)
          WHEN '0' THEN 'the' WHEN '1' THEN 'row' WHEN '2' THEN 'key'
          WHEN '3' THEN 'data' WHEN '4' THEN 'join' WHEN '5' THEN 'sort'
          WHEN '6' THEN 'fast' WHEN '7' THEN 'line' WHEN '8' THEN 'hash'
          ELSE 'group' END), ' ') || ' ' AS mk,
      o.off
    FROM documents, (SELECT unnest([100000, 200000]) AS off) o
    WHERE doc_id < 60)),
corpus AS MATERIALIZED (SELECT * FROM raw0 UNION ALL SELECT * FROM planted),
d AS (
  SELECT doc_id, lang, text, $toks AS tk,
    list_filter(
      list_transform(string_split(text, chr(10)),
        l -> regexp_replace(l, '^\s+|\s+$$', '', 'g')),
      l -> length(l) > 0) AS ls
  FROM corpus),
m AS (
  SELECT doc_id, lang, text,
    CAST(len(tk) AS INT) AS word_cnt,
    CASE WHEN len(tk) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) END AS mwl,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS dlr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE) / len(ls) END AS blr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.$$'))) AS DOUBLE) / len(ls) END AS elr,
    len(list_intersect(tk, ['the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','be','this'])) AS stop_hits
  FROM d),
g AS MATERIALIZED (
  SELECT doc_id, lang, text,
    CASE WHEN word_cnt >= 50 AND word_cnt <= 100000
          AND mwl >= 3.0 AND mwl <= 10.0
          AND dlr < 0.3 AND blr < 0.9 AND elr < 0.3
          AND stop_hits >= 2 THEN 1 ELSE 0 END AS gopher_pass
  FROM m),
ref AS (SELECT text AS t FROM corpus WHERE doc_id >= 100 AND doc_id < 100000),
rt AS (
  SELECT unnest(list_transform(generate_series(1, length(t) - 2), i -> lower(substr(t, i, 3)))) AS tri
  FROM ref WHERE length(t) >= 3),
m0 AS (SELECT tri, count(*) AS n_tri FROM rt GROUP BY tri),
mdl AS (
  SELECT tri,
    ln(n_tri::DOUBLE / sum(n_tri) OVER (PARTITION BY substr(tri, 1, 2))) AS logp
  FROM m0),
sd AS (SELECT doc_id, text FROM g WHERE gopher_pass = 1 AND length(text) >= 3),
dt AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, length(text) - 2), i -> lower(substr(text, i, 3)))) AS tri
  FROM sd),
sc AS (
  SELECT doc_id,
    CAST(sum(CAST(coalesce(mdl.logp, -23.025850929940457) AS DECIMAL(24,12))) AS DOUBLE) / count(*) AS avg_logp
  FROM dt LEFT JOIN mdl USING (tri) GROUP BY doc_id),
rk AS (
  SELECT doc_id, avg_logp,
    row_number() OVER (ORDER BY avg_logp DESC, doc_id) AS rnk,
    count(*) OVER () AS mm
  FROM sc),
lmk AS MATERIALIZED (SELECT doc_id FROM rk WHERE rnk * 2 <= mm + 1),
l0 AS MATERIALIZED (SELECT g.doc_id, g.lang, g.text FROM g JOIN lmk USING (doc_id)),
ls2 AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM l0),
l AS (
  SELECT ls2.doc_id, i.i AS idx, ls2.l[i.i] AS line
  FROM ls2, LATERAL (SELECT unnest(generate_series(1, len(ls2.l))) AS i) i
  WHERE length(trim(ls2.l[i.i])) > 0),
k AS (SELECT doc_id, idx, line,
        row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
      FROM l),
r AS (SELECT doc_id,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
        string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY idx) AS txt
      FROM k GROUP BY doc_id),
reb AS MATERIALIZED (
  SELECT l0.doc_id, l0.lang, r.txt AS text
  FROM l0 JOIN r USING (doc_id) WHERE r.n_kept > 0),
tkc AS (SELECT doc_id, lang, $toks AS tk FROM reb),
tkn AS MATERIALIZED (SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tok, tk FROM tkc),
sh0 AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tkn),
shf AS MATERIALIZED (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 11),
      s -> list_min(list_transform(sh, x -> ('0x' || substr(md5(s::VARCHAR || '|' || x), 1, 15))::BIGINT))) AS sig
  FROM shf),
banded AS MATERIALIZED (
  SELECT doc_id,
    unnest(list_transform(generate_series(0, 3),
      b -> concat_ws(',', b::VARCHAR || ':',
        array_to_string(list_transform(sig[b*3+1:b*3+3], v -> v::VARCHAR), ',')))) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
prs AS MATERIALIZED (
  SELECT c.id1, c.id2
  FROM cand c JOIN shf x ON x.doc_id = c.id1 JOIN shf y ON y.doc_id = c.id2
  WHERE len(list_intersect(x.sh, y.sh)) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.3),
edges AS (
  SELECT id1 AS src, id2 AS dst FROM prs
  UNION ALL SELECT id2, id1 FROM prs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
clusters AS (SELECT id, min(label) AS rep FROM reach GROUP BY id),
assigned AS MATERIALIZED (
  SELECT t.doc_id, coalesce(c.rep, t.doc_id) AS rep
  FROM tkn t LEFT JOIN clusters c ON t.doc_id = c.id),
sizes AS (SELECT rep, count(*) AS cluster_size FROM assigned GROUP BY rep),
wts AS MATERIALIZED (
  SELECT a.doc_id, CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
  FROM assigned a JOIN sizes s ON a.rep = s.rep),
btk AS (SELECT $toks AS tk FROM raw0 WHERE doc_id < 5),
bg AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(tk) < 8 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 7),
                i -> array_to_string(tk[i:i+7], ' '))) END) AS gram
  FROM btk),
dg0 AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN len(tk) < 8 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 7),
                i -> array_to_string(tk[i:i+7], ' '))) END AS grams
  FROM tkn),
ov AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(grams) AS gram FROM dg0) x
  JOIN bg USING (gram) GROUP BY doc_id),
s5 AS MATERIALIZED (
  SELECT t.doc_id, t.lang, t.n_tok, w.weight_ppm,
    CASE WHEN len(d0.grams) > 0
          AND coalesce(ov.n_overlap, 0) * 2 >= len(d0.grams)
         THEN 1 ELSE 0 END AS contam
  FROM tkn t JOIN wts w USING (doc_id) JOIN dg0 d0 USING (doc_id)
  LEFT JOIN ov USING (doc_id)),
c5 AS MATERIALIZED (
  SELECT *, (n_tok * weight_ppm) // 1000000 AS w_tok
  FROM s5 WHERE contam = 0),
mg AS MATERIALIZED (SELECT lang, CAST(sum(w_tok) AS BIGINT) AS mass FROM c5 GROUP BY lang
       HAVING sum(w_tok) > 0),
tot AS (SELECT CAST(sum(mass) AS DOUBLE) AS total FROM mg),
qv AS MATERIALIZED (SELECT lang, mass, pow(mass / tot.total, 0.5) AS q FROM mg, tot),
kv AS (SELECT min(mass / q) AS k FROM qv),
th AS (SELECT lang,
  CAST(floor(least(1.0, kv.k * q / mass) * 1152921504606846976) AS BIGINT) AS thr
  FROM qv, kv),
mixed AS MATERIALIZED (
  SELECT c5.doc_id, c5.n_tok, c5.w_tok FROM c5 JOIN th USING (lang)
  WHERE ('0x' || substr(md5('cp1' || c5.doc_id::VARCHAR), 1, 15))::BIGINT < th.thr),
pt AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard, n_tok AS n FROM mixed),
lists AS (
  SELECT shard, list(struct_pack(id := doc_id, n := n) ORDER BY doc_id) AS lst
  FROM pt GROUP BY shard),
f AS (
  SELECT shard, lst, 1 AS idx,
    CAST(0 AS BIGINT) AS pack, 0 AS pos, CAST(0 AS BIGINT) AS before_t
  FROM lists WHERE len(lst) > 0
  UNION ALL
  SELECT shard, lst, idx + 1,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN pack + 1 ELSE pack END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN 0 ELSE pos + 1 END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN CAST(0 AS BIGINT)
         ELSE before_t + lst[idx].n END
  FROM f WHERE idx < len(lst)),
pk AS (SELECT lst[idx].id AS doc_id, pack AS pack_id, pos AS pack_pos FROM f),
shfl AS (
  SELECT doc_id,
    row_number() OVER (
      ORDER BY ('0x' || substr(md5('cp2' || doc_id::VARCHAR), 1, 15))::BIGINT,
               doc_id) AS shuffle_rank
  FROM mixed)
SELECT g.doc_id, g.gopher_pass,
  CASE WHEN lmk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS lm_kept,
  CASE WHEN reb.doc_id IS NOT NULL THEN 1 ELSE 0 END AS line_kept,
  coalesce(s5.weight_ppm, 0) AS weight_ppm,
  coalesce(s5.contam, -1) AS contam,
  coalesce(c5.w_tok, -1) AS w_tok,
  CASE WHEN mixed.doc_id IS NOT NULL THEN 1 ELSE 0 END AS mix_kept,
  coalesce(pk.pack_id, -1) AS pack_id,
  coalesce(pk.pack_pos, -1) AS pack_pos,
  coalesce(shfl.shuffle_rank, 0) AS shuffle_rank
FROM g
LEFT JOIN lmk USING (doc_id)
LEFT JOIN reb USING (doc_id)
LEFT JOIN s5 USING (doc_id)
LEFT JOIN c5 USING (doc_id)
LEFT JOIN mixed USING (doc_id)
LEFT JOIN pk USING (doc_id)
LEFT JOIN shfl USING (doc_id)
ORDER BY doc_id""",

    // Duplication-aware sampling (q155): the q154 weight CTEs VERBATIM
    // (same shared string), then the weightedSamplePerGroup priority
    // replayed exactly — weight·2^40 div (md5-40bit(salt||key)+1), top-8
    // per doc_id%3 group, ties to the smaller id. All BIGINT arithmetic,
    // both engines' integer division agree on positives.
    "q155_soft_dedup_weighted_sample" ->
      (softDedupWeightsCtes + raw""",
wts AS (
  SELECT a.doc_id, a.doc_id % 3 AS grp,
    CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
  FROM assigned a JOIN sizes s ON a.rep = s.rep),
pri AS (
  SELECT doc_id, grp, weight_ppm,
    CAST(weight_ppm * 1099511627776 //
      (('0x' || substr(md5('sd1' || CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT + 1)
      AS BIGINT) AS priority
  FROM wts WHERE weight_ppm <> 0),
rk AS (
  SELECT doc_id, grp, weight_ppm, priority,
    row_number() OVER (PARTITION BY grp ORDER BY priority DESC, doc_id) AS rn
  FROM pri)
SELECT grp, CAST(rn AS INT) AS sample_rank, doc_id, weight_ppm, priority
FROM rk WHERE rn <= 8 ORDER BY grp, sample_rank"""),

    "q49_winnowing" ->
      raw"""WITH g AS (
  SELECT doc_id, text,
    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
      p -> ('0x' || substr(md5(substr(text, CAST(p AS INT), 8)), 1, 15))::BIGINT) AS grams,
    length(text) - 10 AS n_wins
  FROM documents WHERE doc_id < 100),
f AS (
  SELECT doc_id,
    CASE WHEN n_wins < 1 THEN []
         ELSE list_sort(list_distinct(
           list_transform(generate_series(1, greatest(n_wins, 1)),
             p -> list_min(grams[p:p+3])))) END AS fp
  FROM g)
SELECT doc_id, CAST(len(fp) AS INT) AS n_fp,
list_min(fp) AS fp_min, list_max(fp) AS fp_max
FROM f ORDER BY doc_id""",

    // q50 drains the events file-stream to a COMPLETE-mode memory sink, so
    // the final table is exactly the batch tumbling aggregate — the oracle
    // is q18's SQL verbatim (the streaming path shares tumblingCounts with
    // the batch twin; the decimal-exact sum makes fold order irrelevant).
    "q50_streaming" ->
      raw"""SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""",

    // q51 stages doc_id < 30 fixture texts as real .txt/.pdf/.docx files and
    // re-extracts them; extraction is a lossless round-trip for all three
    // writers (Queries.q51FileIngest), so DuckDB recomputes the same chunk
    // stats straight from documents.parquet: the q13 fixed-window SQL at
    // size=200/stride=160 plus the probe's filename construction.
    "q51_file_ingest" ->
      raw"""WITH docs AS (
  SELECT 'doc' || doc_id || '.' ||
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'txt' WHEN 1 THEN 'pdf' ELSE 'docx' END AS filename,
    text
  FROM documents WHERE doc_id < 30),
wins AS (
  SELECT filename, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 41, 0) / 160) AS BIGINT))) AS i
  FROM docs),
chunks AS (
  SELECT filename,
    regexp_replace(substring(text, CAST(i * 160 + 1 AS INT), 200), '^\s+|\s+$$', '', 'g') AS chunk_text
  FROM wins)
SELECT filename, count(*) AS n_chunks, CAST(sum(length(chunk_text)) AS BIGINT) AS sum_len
FROM chunks WHERE length(chunk_text) > 0
GROUP BY filename ORDER BY filename""",

    "q52_pivot" ->
      raw"""SELECT CAST(user_id % 10 AS INT) AS user_bucket,
count(*) FILTER (WHERE event_type = 'click') AS click,
count(*) FILTER (WHERE event_type = 'error') AS error,
count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
count(*) FILTER (WHERE event_type = 'signup') AS signup,
count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1 ORDER BY user_bucket""",

    "q53_grouping_sets" ->
      raw"""SELECT coalesce(event_type, '(all)') AS event_type,
coalesce(CAST(user_id % 5 AS INT), -1) AS user_mod,
count(*) AS n,
CAST(grouping(event_type) AS INT) AS g_type
FROM (SELECT event_type, user_id FROM events)
GROUP BY GROUPING SETS ((event_type), (user_id % 5), (event_type, user_id % 5))
ORDER BY event_type, user_mod, g_type""",

    "q54_unpivot" ->
      raw"""WITH w AS (
  SELECT p_brand, CAST(min(p_size) AS BIGINT) AS min_size,
    CAST(max(p_size) AS BIGINT) AS max_size, count(*) AS n_parts
  FROM part GROUP BY p_brand)
SELECT p_brand, stat, value_l FROM (
  SELECT p_brand, 'min_size' AS stat, min_size AS value_l FROM w
  UNION ALL SELECT p_brand, 'max_size', max_size FROM w
  UNION ALL SELECT p_brand, 'n_parts', n_parts FROM w)
ORDER BY p_brand, stat""",

    "q55_full_outer" ->
      raw"""WITH pu AS (
  SELECT user_id * 13 AS ukey, count(*) AS n_events FROM events GROUP BY 1)
SELECT coalesce(c_custkey, ukey) AS k,
CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS has_cust,
coalesce(n_events, 0) AS n_events
FROM customer FULL OUTER JOIN pu ON c_custkey = ukey
ORDER BY k""",

    "q56_predicates" ->
      raw"""SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
WHERE (c_name LIKE '%00001%' OR c_mktsegment IN ('BUILDING', 'MACHINERY'))
  AND c_acctbal BETWEEN 0.0 AND 5000.0
  AND NOT (c_nationkey = 13)
ORDER BY c_custkey""",

    "q57_date_arith" ->
      raw"""SELECT o_orderkey,
epoch_ms(CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)) AS plus30d_ms,
epoch_ms(CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP)) AS plus2mo_ms,
CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""",

    // the flagship pipeline twin: clean → fixed(1200,200) → tokens → 64-dim
    // hashed-TF, non-zero coordinates only. Counts are integers so the c²
    // norm sum is order-independent-exact in double; v = c/norm is a single
    // IEEE division — bit-identical to Spark's tfEmbedding.
    "q58_relational_index" ->
      raw"""WITH c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents),
nz AS (SELECT doc_id, text FROM c WHERE length(text) > 0),
wins AS (
  SELECT doc_id, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 201, 0) / 1000) AS BIGINT))) AS i
  FROM nz),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS win_pos,
    regexp_replace(substring(text, CAST(i * 1000 + 1 AS INT), 1200), '^\s+|\s+$$', '', 'g') AS chunk_text
  FROM wins),
kept AS (SELECT doc_id, win_pos, chunk_text FROM chunks WHERE length(chunk_text) > 0),
tk AS (
  SELECT doc_id, win_pos, CAST(length(chunk_text) AS INT) AS chunk_len,
    unnest(list_filter(string_split_regex(lower(chunk_text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS tok
  FROM kept),
bucketed AS (
  SELECT doc_id, win_pos, chunk_len, ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
  FROM tk),
counts AS (
  SELECT doc_id, win_pos, chunk_len, b, CAST(count(*) AS DOUBLE) AS cnt
  FROM bucketed GROUP BY 1, 2, 3, 4),
norms AS (
  SELECT doc_id, win_pos, sqrt(sum(cnt * cnt)) AS nrm FROM counts GROUP BY 1, 2)
SELECT co.doc_id, co.win_pos, co.chunk_len, CAST(co.b AS INT) AS dim,
  CAST(floor(co.cnt / n.nrm * 1000000) AS BIGINT) AS v_u
FROM counts co JOIN norms n ON co.doc_id = n.doc_id AND co.win_pos = n.win_pos
ORDER BY co.doc_id, co.win_pos, dim""",

    // the TYPED index pipeline (q40) replayed through the relational twin's
    // SQL: every output column is an integer-exact projection — chunk md5
    // fingerprint, non-zero embedding coordinates = the DISTINCT md5 token
    // buckets (float-free), chunk_index = kept-chunk rank (the typed path
    // renumbers kept chunks; win_pos is the cursor index). LEFT JOIN keeps
    // zero-token chunks (their embedding is the zero vector ⇒ nnz 0).
    "q40_index_pipeline" ->
      raw"""WITH c AS (
  SELECT doc_id, source,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents),
nz AS (SELECT doc_id, source, text FROM c WHERE length(text) > 0),
wins AS (
  SELECT doc_id, source, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 201, 0) / 1000) AS BIGINT))) AS i
  FROM nz),
kept AS (
  SELECT doc_id, source, CAST(i AS INT) AS win_pos, chunk_text FROM (
    SELECT doc_id, source, i,
      regexp_replace(substring(text, CAST(i * 1000 + 1 AS INT), 1200), '^\s+|\s+$$', '', 'g') AS chunk_text
    FROM wins)
  WHERE length(chunk_text) > 0),
idx AS (
  SELECT doc_id, source, win_pos, chunk_text,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY win_pos) - 1 AS INT) AS chunk_index
  FROM kept),
tk AS (
  SELECT doc_id, win_pos,
    unnest(list_filter(string_split_regex(lower(chunk_text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS tok
  FROM kept),
buckets AS (
  SELECT DISTINCT doc_id, win_pos, ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b
  FROM tk),
agg AS (
  SELECT doc_id, win_pos, CAST(count(*) AS INT) AS nnz, CAST(sum(b) AS INT) AS nz_dim_sum
  FROM buckets GROUP BY 1, 2)
SELECT i.doc_id,
  i.source || '/' || CAST(i.doc_id AS VARCHAR) || '.txt' AS filename,
  i.chunk_index, 'fixed' AS split_strategy,
  CAST(length(i.chunk_text) AS INT) AS chunk_len,
  substr(md5(i.chunk_text), 1, 16) AS chunk_fp,
  coalesce(a.nnz, 0) AS nnz, coalesce(a.nz_dim_sum, 0) AS nz_dim_sum,
  epoch_ms(TIMESTAMP '2026-01-01 00:00:00') AS created_ms
FROM idx i LEFT JOIN agg a ON i.doc_id = a.doc_id AND i.win_pos = a.win_pos
ORDER BY i.doc_id, i.chunk_index""",

    // Typed index pipeline at the reference dimensionality (q152): q40's
    // replay verbatim except the doc slice (doc_id < 100) and the hashed
    // bucket modulus (768 — index_documents.py:263's default).
    "q152_index_pipeline_768" ->
      raw"""WITH c AS (
  SELECT doc_id, source,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents WHERE doc_id < 100),
nz AS (SELECT doc_id, source, text FROM c WHERE length(text) > 0),
wins AS (
  SELECT doc_id, source, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 201, 0) / 1000) AS BIGINT))) AS i
  FROM nz),
kept AS (
  SELECT doc_id, source, CAST(i AS INT) AS win_pos, chunk_text FROM (
    SELECT doc_id, source, i,
      regexp_replace(substring(text, CAST(i * 1000 + 1 AS INT), 1200), '^\s+|\s+$$', '', 'g') AS chunk_text
    FROM wins)
  WHERE length(chunk_text) > 0),
idx AS (
  SELECT doc_id, source, win_pos, chunk_text,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY win_pos) - 1 AS INT) AS chunk_index
  FROM kept),
tk AS (
  SELECT doc_id, win_pos,
    unnest(list_filter(string_split_regex(lower(chunk_text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS tok
  FROM kept),
buckets AS (
  SELECT DISTINCT doc_id, win_pos, ('0x' || substr(md5(tok), 1, 15))::BIGINT % 768 AS b
  FROM tk),
agg AS (
  SELECT doc_id, win_pos, CAST(count(*) AS INT) AS nnz, CAST(sum(b) AS INT) AS nz_dim_sum
  FROM buckets GROUP BY 1, 2)
SELECT i.doc_id,
  i.source || '/' || CAST(i.doc_id AS VARCHAR) || '.txt' AS filename,
  i.chunk_index, 'fixed' AS split_strategy,
  CAST(length(i.chunk_text) AS INT) AS chunk_len,
  substr(md5(i.chunk_text), 1, 16) AS chunk_fp,
  coalesce(a.nnz, 0) AS nnz, coalesce(a.nz_dim_sum, 0) AS nz_dim_sum,
  epoch_ms(TIMESTAMP '2026-01-01 00:00:00') AS created_ms
FROM idx i LEFT JOIN agg a ON i.doc_id = a.doc_id AND i.win_pos = a.win_pos
ORDER BY i.doc_id, i.chunk_index""",

    // Scanned-document OCR (q153): the construction oracle recomputes the
    // expected OCR text relationally — printable-ASCII filter, 600-char
    // cap, 60-col wrap, per-line rtrim (trailing spaces carry no ink in a
    // scan), \n join — never seeing the raster path. A hash match proves
    // rasterize → PDF → XObject decode → template match is the identity
    // on the supported class.
    "q153_scanned_ocr" ->
      raw"""WITH docs AS (
  SELECT 'doc' || doc_id || '.pdf' AS filename,
    substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 600) AS f
  FROM documents WHERE doc_id < 25),
nonempty AS (SELECT filename, f FROM docs WHERE length(f) > 0),
wins AS (
  SELECT filename, f,
    unnest(generate_series(0, CAST(floor((length(f) - 1) / 60) AS BIGINT))) AS i
  FROM nonempty),
segs AS (
  SELECT filename, i,
    rtrim(substring(f, CAST(i * 60 + 1 AS INT), 60), ' ') AS seg
  FROM wins),
rec AS (
  SELECT filename, string_agg(seg, chr(10) ORDER BY i) AS t
  FROM segs GROUP BY filename)
SELECT filename, CAST(length(t) AS BIGINT) AS text_len, md5(t) AS text_md5
FROM rec ORDER BY filename""",

    // semantic search (q41): sparse cosine on unnormalized integer counts —
    // scale-invariant, so the score equals the normalized form's; dot and
    // norm² are exact integers, the sqrt/multiply/divide are single IEEE
    // double ops, bit-identical to Spark's. The query vector is recomputed
    // in SQL from the literal query text via the same md5 bucketing.
    "q41_search_text" ->
      raw"""WITH c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents),
nz AS (SELECT doc_id, text FROM c WHERE length(text) > 0),
wins AS (
  SELECT doc_id, text,
    unnest(generate_series(0, CAST(floor(greatest(length(text) - 201, 0) / 1000) AS BIGINT))) AS i
  FROM nz),
kept AS (
  SELECT doc_id, CAST(i AS INT) AS win_pos, chunk_text FROM (
    SELECT doc_id, i,
      regexp_replace(substring(text, CAST(i * 1000 + 1 AS INT), 1200), '^\s+|\s+$$', '', 'g') AS chunk_text
    FROM wins)
  WHERE length(chunk_text) > 0),
tk AS (
  SELECT doc_id, win_pos,
    unnest(list_filter(string_split_regex(lower(chunk_text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS tok
  FROM kept),
counts AS (
  SELECT doc_id, win_pos, ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b,
    CAST(count(*) AS BIGINT) AS cnt
  FROM tk GROUP BY 1, 2, 3),
q AS (
  SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS b, CAST(count(*) AS BIGINT) AS qc
  FROM (SELECT unnest(list_filter(string_split_regex(lower('spark join query fast'),
    '[^\p{L}\p{N}]+'), x -> x <> '')) AS tok)
  GROUP BY 1),
qn AS (SELECT sqrt(CAST(sum(qc * qc) AS DOUBLE)) AS qnorm FROM q),
scored AS (
  SELECT co.doc_id, co.win_pos,
    CAST(sum(co.cnt * coalesce(q.qc, 0)) AS DOUBLE) AS dot,
    CAST(sum(co.cnt * co.cnt) AS DOUBLE) AS ss
  FROM counts co LEFT JOIN q ON co.b = q.b
  GROUP BY 1, 2),
top AS (
  SELECT s.doc_id, s.win_pos, s.dot / (sqrt(s.ss) * qn.qnorm) AS score
  FROM scored s CROSS JOIN qn
  ORDER BY score DESC, s.doc_id, s.win_pos LIMIT 5)
SELECT t.doc_id, t.win_pos,
  substr(md5(k.chunk_text), 1, 16) AS chunk_fp,
  CAST(floor(t.score * 1000000) AS BIGINT) AS score_u
FROM top t JOIN kept k ON t.doc_id = k.doc_id AND t.win_pos = k.win_pos
ORDER BY score_u DESC, t.doc_id, t.win_pos""",

    // sentence split, lookbehind-free: maximal segments whose internal
    // whitespace never directly follows [.!?] — identical to the reference
    // split for ASCII whitespace (see Chunkers.SentenceSegmentPattern)
    // Real-image-decode probe: Spark encodes formula pixels as PNG and
    // decodes them back with ImageIO; the oracle recomputes the same sums
    // straight from the closed-form pixel formula (PNG is lossless, so the
    // encode→decode round-trip must reproduce it bit-exactly).
    "q45_multimodal" ->
      raw"""WITH ids AS (SELECT unnest(generate_series(0, 99)) AS media_id),
px AS (
  SELECT media_id,
    CAST(sum((media_id*31 + x*7 + y*13) % 256
           + (media_id*17 + x*11 + y*3) % 256
           + (media_id*23 + x*5 + y*19) % 256) AS BIGINT) AS px_sum
  FROM ids, generate_series(0, 63) AS gx(x), generate_series(0, 47) AS gy(y)
  WHERE media_id % 3 = 0
  GROUP BY media_id)
SELECT i.media_id,
  CASE WHEN i.media_id % 3 = 0 THEN 'image'
       WHEN i.media_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(CASE WHEN i.media_id % 3 = 0 THEN 64 END AS INT) AS img_w,
  CAST(CASE WHEN i.media_id % 3 = 0 THEN 48 END AS INT) AS img_h,
  px.px_sum
FROM ids i LEFT JOIN px USING (media_id)
ORDER BY media_id""",

    // Real-video-decode probe (q102, the q45/q81 pattern for AVI):
    // uncompressed RGB24 frames are lossless, so px_sum replays from the
    // closed-form per-(id, frame, x, y) channel formulas; n_frames is the
    // generator's 2 + id%3.
    "q102_video_decode" ->
      raw"""WITH ids AS (
  SELECT unnest(generate_series(0, 99)) AS media_id),
vids AS (SELECT media_id, 2 + media_id % 3 AS nf FROM ids WHERE media_id % 3 = 2),
px AS (
  SELECT v.media_id,
    CAST(sum((v.media_id*31 + f*41 + x*7 + y*13) % 256
           + (v.media_id*17 + f*29 + x*11 + y*3) % 256
           + (v.media_id*23 + f*37 + x*5 + y*19) % 256) AS BIGINT) AS px_sum
  FROM vids v, generate_series(0, 3) AS gf(f),
       generate_series(0, 31) AS gx(x), generate_series(0, 23) AS gy(y)
  WHERE f < v.nf
  GROUP BY v.media_id)
SELECT v.media_id, CAST(v.nf AS INT) AS n_frames,
  CAST(32 AS INT) AS vid_w, CAST(24 AS INT) AS vid_h, px.px_sum
FROM vids v JOIN px USING (media_id)
ORDER BY media_id""",

    // char entropy (q103): −p·ln(p) terms cast DECIMAL(24,12) before the
    // per-doc sum (combine-order independence, the BM25 discipline); p is
    // the identical double quotient cnt/len in both engines.
    "q103_char_entropy" ->
      raw"""WITH ch AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         unnest(string_split(text, '')) AS ch
  FROM documents),
cnts AS (
  SELECT doc_id, n_chars, ch, count(*) AS cnt
  FROM ch GROUP BY doc_id, n_chars, ch)
SELECT doc_id, n_chars,
  floor(1000 * CAST(sum(CAST(
    -(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))
      * ln(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))
    AS DECIMAL(24,12))) AS DOUBLE)) / 1 AS ent_m
FROM cnts GROUP BY doc_id, n_chars ORDER BY doc_id""",

    // key-skew stats (q104): exact-integer ppm shares (subtract-remainder
    // then divide — the ngramRepetition discipline), ties to smaller key.
    "q104_skew_stats" ->
      raw"""WITH c AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
SELECT c.user_id, c.n,
  (c.n * 1000000 - (c.n * 1000000) % t.t) // t.t AS share_ppm
FROM c, t ORDER BY c.n DESC, c.user_id LIMIT 10""",

    // canonical URL (q105): the identical regex chain (RE2-portable set —
    // no lookarounds), identical planted inputs; list_sort/array_sort are
    // both binary-collation lexicographic.
    "q105_canonical_url" ->
      raw"""WITH u AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) ||
    '://' ||
    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Site.Example'
          WHEN doc_id % 3 = 1 THEN 'site.example'
          ELSE 'site.example:443' END) ||
    '/a/' || CAST(doc_id % 50 AS VARCHAR) ||
    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
    (CASE doc_id % 5 WHEN 0 THEN '?utm_source=x&b=2&a=1'
                     WHEN 1 THEN '?a=1&b=2'
                     WHEN 2 THEN '?b=2&a=1&gclid=zz'
                     WHEN 3 THEN '?fbclid=q' ELSE '' END) ||
    (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
  FROM documents),
parts AS (
  SELECT doc_id, regexp_replace(url, '#.*$$', '') AS u1 FROM u),
canon AS (
  SELECT doc_id,
    lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
    regexp_replace(regexp_replace(
      lower(regexp_extract(u1, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      ':(80|443)$$', ''), '^www\.', '') ||
    regexp_replace(
      regexp_extract(u1, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      '/+$$', '') ||
    (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canon
  FROM (
    SELECT doc_id, u1,
      -- array_to_string of an EMPTY list is NULL in DuckDB — coalesce
      coalesce(array_to_string(list_sort(list_filter(
        string_split(regexp_extract(u1, '\?([^#]*)', 1), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)(=|$$)'))), '&'), '') AS qs
    FROM parts))
SELECT doc_id, canon,
  min(doc_id) OVER (PARTITION BY canon) AS rep_id,
  CAST(doc_id = min(doc_id) OVER (PARTITION BY canon) AS INT) AS kept
FROM canon ORDER BY doc_id""",

    // exact-k per group (q106): identical md5-60bit rank, ties to the
    // smaller event_id.
    "q106_exact_k_sample" ->
      raw"""SELECT event_type, CAST(rn AS INT) AS sample_rank, event_id
FROM (
  SELECT event_type, event_id,
    row_number() OVER (PARTITION BY event_type
      ORDER BY ('0x' || substr(md5('ev1' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT,
               event_id) AS rn
  FROM events)
WHERE rn <= 3 ORDER BY event_type, sample_rank""",

    // robust outliers (q107): exact integer cents → medians on .5 steps,
    // deviations on .25 steps — every quantity and the 3·MAD boundary are
    // exactly representable doubles, so the flag counts cannot flap.
    "q107_robust_outliers" ->
      raw"""WITH c AS (
  SELECT event_type,
    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(12,0)) AS DOUBLE) AS cents
  FROM events),
m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY event_type),
j AS (
  SELECT c.event_type, c.cents, m.med, abs(c.cents - m.med) AS ad
  FROM c JOIN m USING (event_type)),
d AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM j GROUP BY event_type)
SELECT j.event_type, count(*) AS n, min(j.med) AS med_c, min(d.mad) AS mad_c,
  CAST(sum(CASE WHEN j.ad > 3.0 * d.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
FROM j JOIN d USING (event_type)
GROUP BY j.event_type ORDER BY j.event_type""",

    // column profile (q108): per-column UNION ALL — exact integers and
    // stringified min/max (DuckDB casts 1.0 → '1.0' like Spark).
    "q108_profile" ->
      raw"""SELECT * FROM (
  SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
    count(*) - count(l_orderkey) AS n_null,
    count(DISTINCT l_orderkey) AS n_distinct,
    CAST(min(l_orderkey) AS VARCHAR) AS min_s, CAST(max(l_orderkey) AS VARCHAR) AS max_s
  FROM lineitem
  UNION ALL
  SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
    count(DISTINCT l_partkey), CAST(min(l_partkey) AS VARCHAR), CAST(max(l_partkey) AS VARCHAR)
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
    count(DISTINCT l_quantity), CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
    count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
  FROM lineitem)
ORDER BY col_name""",

    // behavioral funnel (q109): per-stage first-event times in epoch-µs
    // longs, stage windows of exactly 3600000000 µs, exact-integer ppm.
    "q109_funnel" ->
      raw"""WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.us) AS c_us
  FROM e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.us >= v.v_us AND e.us <= v.v_us + 3600000000
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.us) AS p_us
  FROM e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.us >= c.c_us AND e.us <= c.c_us + 3600000000
  GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v) AS n_view,
  (SELECT count(*) FROM c) AS n_click,
  (SELECT count(*) FROM p) AS n_purchase,
  ((SELECT count(*) FROM p) * 1000000
    - ((SELECT count(*) FROM p) * 1000000) % (SELECT count(*) FROM v))
    // (SELECT count(*) FROM v) AS conv_ppm""",

    // weekly retention (q110): integer epoch-weeks (// on µs), distinct
    // (user, week) frame self-joined at week+1, exact ppm.
    "q110_retention" ->
      raw"""WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
act AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk),
ret AS (
  SELECT a.wk, count(*) AS n_retained
  FROM uw a JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1
  GROUP BY a.wk)
SELECT act.wk, act.n_active, coalesce(ret.n_retained, 0) AS n_retained,
  (coalesce(ret.n_retained, 0) * 1000000
    - (coalesce(ret.n_retained, 0) * 1000000) % act.n_active) // act.n_active AS ret_ppm
FROM act LEFT JOIN ret ON act.wk = ret.wk
ORDER BY act.wk""",

    // exact histogram (q111): integer-cents buckets, (c−min)·10 // (span+1)
    // — clamp-free top edge, exact counts and sums.
    "q111_histogram" ->
      raw"""WITH c AS (
  SELECT CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(12,0)) AS BIGINT) AS c
  FROM events),
b AS (SELECT min(c) AS mn, max(c) AS mx FROM c)
SELECT (c.c - b.mn) * 10 // (b.mx - b.mn + 1) AS bucket,
  count(*) AS n, CAST(sum(c.c) AS BIGINT) AS cents_sum
FROM c, b GROUP BY bucket ORDER BY bucket""",

    // Seeded deterministic LSH (q112) — SQL shared with q119, see
    // seededLshSql.
    "q112_seeded_lsh" -> seededLshSql,

    // Seeded-LSH pairs from the PERSISTED incremental index (q119):
    // build(evens) + append(odds) ≡ full build, so the oracle is the
    // identical hash-family replay — what the probe pins is that the
    // MAINTAINED index reproduces it.
    "q119_lsh_index_pairs" -> seededLshSql,

    // Exact heavy hitters from a COMPACTED store (q120): nomination from
    // {compacted blob, live batch} + exact verify ≡ q114's full-stream
    // answer, see heavyHittersSql.
    "q120_compacted_hh" -> heavyHittersSql,

    // Leakage-safe splits (q121): q116's exact prefix-Jaccard pairs
    // (θ = 0.25, docs < 800), recursive-CTE transitive closure to the
    // min-id representative (q48's shape), then the q101 split hash drawn
    // on the REPRESENTATIVE (salt 'split7') — near-dup clusters cannot
    // straddle a split boundary.
    "q121_leakage_splits" ->
      raw"""WITH RECURSIVE tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 800),
shc AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk),
s AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS l FROM shc WHERE len(sh) > 0),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i, a.l + b.l AS lsum
  FROM s a JOIN s b ON a.doc_id < b.doc_id),
pairs AS (SELECT id1, id2 FROM p WHERE i * 1000000 >= 250000 * (lsum - i)),
edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
reps AS (SELECT id, min(label) AS rep FROM reach GROUP BY id),
keyed AS (
  SELECT d.doc_id, coalesce(r.rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN reps r ON r.id = d.doc_id),
h AS (
  SELECT doc_id,
    ('0x' || substr(md5('split7' || CAST(rep AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM keyed),
sp AS (
  SELECT doc_id, CASE WHEN hv < $splitT1 THEN 'train'
                      WHEN hv < $splitT2 THEN 'val'
                      ELSE 'test' END AS split
  FROM h)
SELECT split, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM sp GROUP BY split ORDER BY split""",

    // Perceptual image dedup (q122): the staged construction — 50
    // dHash-diverse PNGs, each present twice as ids (i, i+1000) — makes
    // the exact t=3 pair set derivable with no image decoding: exactly
    // the planted duplicates at Hamming 0.
    "q122_image_dedup" ->
      raw"""SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
FROM range(50) t(i) ORDER BY id1, id2""",

    // Perceptual audio dedup (q123): the q122 construction for WAV clips —
    // 50 envelope-diverse seeds staged twice, exact banded Hamming pairs.
    "q123_audio_dedup" ->
      raw"""SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
FROM range(50) t(i) ORDER BY id1, id2""",

    // Perceptual video dedup (q124): the same construction over real
    // RIFF/AVI RGB24 clips, first-frame dHash.
    "q124_video_dedup" ->
      raw"""SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
FROM range(50) t(i) ORDER BY id1, id2""",

    // Full-sequence video dedup (q125): 25 clips staged as (clip,
    // identical restage, first-frame splice); per-frame-diverse greedy
    // seed selection fixes the vote-qualified pair set to exactly the 25
    // identical restages — 6/6 aligned frames, vote 1.0 — while every
    // splice scores 1/6 < 0.8 and drops.
    "q125_video_sequence_dedup" ->
      raw"""SELECT i AS id1, i + 1000 AS id2,
CAST(6 AS BIGINT) AS matched_frames, CAST(6 AS BIGINT) AS total_frames,
CAST(1.0 AS DOUBLE) AS vote_frac
FROM range(25) t(i) ORDER BY id1, id2""",

    // Shift-tolerant sequence video dedup (q126): 25 clips staged as
    // (clip, intro-trimmed-by-2, shifted splice, identical restage); the
    // all-frames-diverse greedy selection fixes the result to exactly the
    // three planted pair families per clip — the trim matches 6/8 at
    // offset −2, the restage 8/8 at offset 0, trim-vs-restage 6/8 at
    // offset +2 — while every shifted splice scores 1/8 < 0.7 and drops.
    "q126_video_shifted_dedup" ->
      raw"""SELECT id1, id2, frame_offset, matched_frames, total_frames, vote_frac
FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(-2 AS INTEGER) AS frame_offset,
    CAST(6 AS BIGINT) AS matched_frames, CAST(8 AS BIGINT) AS total_frames,
    CAST(0.75 AS DOUBLE) AS vote_frac
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 3000 AS id2, CAST(0 AS INTEGER),
    CAST(8 AS BIGINT), CAST(8 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 3000 AS id2, CAST(2 AS INTEGER),
    CAST(6 AS BIGINT), CAST(8 AS BIGINT), CAST(0.75 AS DOUBLE)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Incremental sequence dedup (q128): the q126 construction split into
    // two batches against a fresh signature store — batch 2's pairs
    // against history (trim at -2, restage at 0) plus the batch-internal
    // trim-vs-restage (+2); splices drop; batch 1 emits nothing.
    "q128_incremental_sequence_dedup" ->
      raw"""SELECT id1, id2, frame_offset, matched_frames, total_frames, vote_frac
FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(-2 AS INTEGER) AS frame_offset,
    CAST(6 AS BIGINT) AS matched_frames, CAST(8 AS BIGINT) AS total_frames,
    CAST(0.75 AS DOUBLE) AS vote_frac
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 2000 AS id2, CAST(0 AS INTEGER),
    CAST(8 AS BIGINT), CAST(8 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 2000 AS id2, CAST(2 AS INTEGER),
    CAST(6 AS BIGINT), CAST(8 AS BIGINT), CAST(0.75 AS DOUBLE)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Perceptual contamination (q129): 10 eval images are exact
    // re-encodes of corpus images 0..9; the remaining 5 eval images and
    // all 50 corpus images are pairwise > 3 dHash bits apart by greedy
    // selection — the result is exactly the planted identity matches.
    "q129_perceptual_contamination" ->
      raw"""SELECT i AS media_id, i + 9000 AS eval_id,
CAST(0 AS BIGINT) AS hamming
FROM range(10) t(i) ORDER BY media_id, eval_id""",

    // PQ/ADC ANN (q130): full replay of the deterministic tier — q75 int8
    // codes, md5-ranked sampled codebooks (m=8, ksub=16, subdim=8; the
    // q112 md5-as-int convention), integer argmin encode (ranking key
    // c·c − 2·sub·c, ties → lowest j), ADC inner-product ranking for
    // vec_id 0 (ties → lowest vec_id), top-50 candidates, exact-cosine
    // rescore top-10 — the q15 output discipline.
    "q130_pq_adc" ->
      raw"""WITH sc AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
  FROM embeddings),
c AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)) END AS codes
  FROM sc),
rk AS (
  SELECT sub.s, c.vec_id,
    row_number() OVER (PARTITION BY sub.s
      ORDER BY ('0x' || substr(md5(sub.s::VARCHAR || '|' || c.vec_id::VARCHAR), 1, 15))::BIGINT,
               c.vec_id) AS rk
  FROM c, (SELECT unnest(generate_series(0, 7)) AS s) sub),
cent AS (
  SELECT rk.s, rk.rk - 1 AS j, c.codes[rk.s*8 + 1 : rk.s*8 + 8] AS cv
  FROM rk JOIN c ON c.vec_id = rk.vec_id
  WHERE rk.rk <= 16),
asg0 AS (
  SELECT c.vec_id, cent.s, cent.j,
    list_inner_product(cent.cv, cent.cv)
      - 2 * list_inner_product(c.codes[cent.s*8 + 1 : cent.s*8 + 8], cent.cv) AS d
  FROM c, cent
  WHERE c.vec_id <> 0),
asg AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS r
    FROM asg0) WHERE r = 1),
q AS (SELECT codes FROM c WHERE vec_id = 0),
adc AS (
  SELECT asg.vec_id,
    sum(list_inner_product(q.codes[asg.s*8 + 1 : asg.s*8 + 8], cent.cv)) AS adc_ip
  FROM asg JOIN cent ON cent.s = asg.s AND cent.j = asg.j, q
  GROUP BY asg.vec_id),
cand AS (SELECT vec_id FROM adc ORDER BY adc_ip DESC, vec_id LIMIT 50)
SELECT e.vec_id,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[])) / 1000 AS cos_sim
FROM cand
JOIN embeddings e USING (vec_id),
     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, e.vec_id
LIMIT 10""",

    // Crop/pad-tolerant image dedup (q131): 25 tile-grid PNGs staged as
    // (image, one-tile-column-and-row crop, 2-D splice, identical
    // restage); the grid-diverse greedy screen fixes the result to the
    // three planted pair families — the crop matches 6/12 tiles at
    // offset (-1,-1), the restage 12/12 at (0,0), crop-vs-restage 6/12
    // at (+1,+1) — while every splice scores ≤ 3/12 < 0.5 and drops.
    "q131_cropped_image_dedup" ->
      raw"""SELECT id1, id2, offset_x, offset_y, matched_tiles, total_tiles, vote_frac
FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(-1 AS INTEGER) AS offset_x,
    CAST(-1 AS INTEGER) AS offset_y, CAST(6 AS BIGINT) AS matched_tiles,
    CAST(12 AS BIGINT) AS total_tiles, CAST(0.5 AS DOUBLE) AS vote_frac
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 3000 AS id2, CAST(0 AS INTEGER), CAST(0 AS INTEGER),
    CAST(12 AS BIGINT), CAST(12 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 3000 AS id2, CAST(1 AS INTEGER),
    CAST(1 AS INTEGER), CAST(6 AS BIGINT), CAST(12 AS BIGINT),
    CAST(0.5 AS DOUBLE)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Flip/rotation-tolerant image dedup (q132): 25 canonical-diverse
    // PNGs staged as (image, mirror-x, rot90); the orientation-canonical
    // hash is D4-orbit-invariant, so the result is exactly the 75
    // within-orbit pairs at Hamming 0.
    "q132_flipped_image_dedup" ->
      raw"""SELECT id1, id2, hamming FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 2000 AS id2, CAST(0 AS BIGINT) FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 2000 AS id2, CAST(0 AS BIGINT)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Bloom-pruned selective join (q140): the bloom is execution-only
    // pruning (fp rides through to the exact join), so the oracle is the
    // plain join — the q46 salted-join discipline.
    "q140_bloom_pruned_join" ->
      raw"""SELECT c_mktsegment, count(*) AS n_events,
round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
WHERE c_nationkey = 7
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // Incremental profile (q141): two batches folded into a store merge
    // back to the whole-table card's mergeable metrics (no n_distinct).
    "q141_incremental_profile" ->
      raw"""SELECT "column", n_rows, n_non_null, n_null, min_value, max_value
FROM (
  SELECT 'doc_id' AS "column", count(*) AS n_rows, count(doc_id) AS n_non_null,
    count(*) - count(doc_id) AS n_null,
    CAST(min(doc_id) AS VARCHAR) AS min_value,
    CAST(max(doc_id) AS VARCHAR) AS max_value
  FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(lang), count(*) - count(lang),
    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(n_chars), count(*) - count(n_chars),
    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
  UNION ALL
  SELECT 'score', count(*), count(n_chars), count(*) - count(n_chars),
    CAST(min(n_chars / 100.0) AS VARCHAR), CAST(max(n_chars / 100.0) AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'source', count(*), count(source), count(*) - count(source),
    CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
) ORDER BY "column"""",

    // Exact order-statistic quantile card (q142): the SAME integer-ppm
    // position rule (k = ceil(q*n/1e6) via (q*n + 999999) // 1e6) over a
    // row_number ranking — no interpolation, no float index.
    "q142_quantile_card" ->
      raw"""WITH s AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) AS rk
  FROM documents WHERE n_chars IS NOT NULL
), c AS (SELECT count(*) AS n FROM s)
SELECT CAST(q.q_ppm AS BIGINT) AS q_ppm, s.n_chars AS value
FROM (VALUES (10000), (250000), (500000), (750000), (950000), (990000)) q(q_ppm),
  c, s
WHERE s.rk = (CAST(q.q_ppm AS BIGINT) * c.n + 999999) // 1000000
ORDER BY q_ppm""",

    // Composite-key integrity check (q143): key combinations held by
    // more than one row, with multiplicities.
    "q143_duplicate_keys" ->
      raw"""SELECT lang, source, count(*) AS n FROM documents
GROUP BY lang, source HAVING count(*) > 1
ORDER BY lang, source, n""",

    // Per-group quantile card (q144): the q142 position rule with the
    // rank window partitioned by language.
    "q144_group_quantiles" ->
      raw"""WITH s AS (
  SELECT lang AS grp, n_chars,
    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
    count(*) OVER (PARTITION BY lang) AS n
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT grp, CAST(q.q_ppm AS BIGINT) AS q_ppm, s.n_chars AS value
FROM (VALUES (500000), (950000)) q(q_ppm), s
WHERE s.rk = (CAST(q.q_ppm AS BIGINT) * s.n + 999999) // 1000000
ORDER BY grp, q_ppm""",

    // Referential-integrity check (q145): non-null event user_ids with no
    // row in the truncated customer reference (the full reference is
    // clean, which would make the probe an always-empty tautology).
    "q145_dangling_keys" ->
      raw"""SELECT user_id, count(*) AS n FROM events
WHERE user_id IS NOT NULL
  AND user_id NOT IN (SELECT c_custkey FROM customer
                      WHERE c_custkey < 100 AND c_custkey IS NOT NULL)
GROUP BY user_id ORDER BY user_id""",

    // Topic-balanced sample (q146): deterministic smallest-id centroids,
    // cosine argmax assignment (the q87 replay discipline), md5-60bit
    // exact-k cut per cluster (the q106 rule).
    "q146_cluster_balanced_sample" ->
      raw"""WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 8),
a AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                 c.cid) AS r
    FROM embeddings e, c) t WHERE r = 1)
SELECT vec_id, cid AS cluster_id, CAST(rn AS INT) AS sample_rank
FROM (
  SELECT vec_id, cid,
    row_number() OVER (PARTITION BY cid
      ORDER BY ('0x' || substr(md5('cb1' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
               vec_id) AS rn
  FROM a)
WHERE rn <= 5 ORDER BY cluster_id, sample_rank""",

    // Watermark-drop twin (q147): the append-mode streaming run's exact
    // batch replay — batch 1 = even event_ids, watermark wm1 =
    // max(even ts) − 30 min; an odd row is DROPPED iff its hour window's
    // END is ≤ wm1 (window-end lateness, StreamsSpec-pinned), and the
    // drained sink holds exactly the windows whose end ≤ the final
    // watermark (max(all ts) − 30 min). The fixture's sub-hour max-ts
    // offsets keep every comparison off boundary equality; aggregate
    // forms mirror q18 (decimal-exact sum, epoch_ms hour key).
    "q147_watermark_drops" ->
      raw"""WITH wm1 AS (
  SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events WHERE event_id % 2 = 0
), wmf AS (
  SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events
), kept AS (
  SELECT e.* FROM events e, wm1
  WHERE e.event_id % 2 = 0
     OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm1.w
)
SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
  count(*) AS n,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM kept, wmf
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wmf.w
GROUP BY 1, 2
ORDER BY hour_ms, event_type""",

    // Composed IVF-PQ ANN (q148): the q30 coarse tier fused onto the
    // q130 PQ replay. CTEs sc/c/rk/cent/asg0/asg/q/adc are q130's
    // verbatim (i8 codes, md5-ranked sampled codebooks, integer argmin
    // encode, ADC inner product) with ONE added restriction: asg0 keeps
    // only corpus vectors whose q30-style coarse assignment (8 seed
    // centroids = vec_id < 8, ties → lowest cid) lands in the nProbe=4
    // clusters nearest the query vector (ties → lowest cid) — the
    // partition-pruned read of the persisted index. Candidates top-50 by
    // (adc DESC, vec_id), exact-cosine rescore top-10 — the q15 output
    // discipline.
    "q148_ivf_pq" ->
      raw"""WITH sc AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
  FROM embeddings),
c AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)) END AS codes
  FROM sc),
rk AS (
  SELECT sub.s, c.vec_id,
    row_number() OVER (PARTITION BY sub.s
      ORDER BY ('0x' || substr(md5(sub.s::VARCHAR || '|' || c.vec_id::VARCHAR), 1, 15))::BIGINT,
               c.vec_id) AS rk
  FROM c, (SELECT unnest(generate_series(0, 7)) AS s) sub),
cent AS (
  SELECT rk.s, rk.rk - 1 AS j, c.codes[rk.s*8 + 1 : rk.s*8 + 8] AS cv
  FROM rk JOIN c ON c.vec_id = rk.vec_id
  WHERE rk.rk <= 16),
cents AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT e.vec_id, cc.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM embeddings e CROSS JOIN cents cc WHERE e.vec_id <> 0)
  WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT cc.cid,
      row_number() OVER (ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM cents cc, (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
  WHERE rn <= 4),
asg0 AS (
  SELECT c.vec_id, cent.s, cent.j,
    list_inner_product(cent.cv, cent.cv)
      - 2 * list_inner_product(c.codes[cent.s*8 + 1 : cent.s*8 + 8], cent.cv) AS d
  FROM c, cent
  WHERE c.vec_id <> 0
    AND c.vec_id IN (SELECT a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid)),
asg AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS r
    FROM asg0) WHERE r = 1),
q AS (SELECT codes FROM c WHERE vec_id = 0),
adc AS (
  SELECT asg.vec_id,
    sum(list_inner_product(q.codes[asg.s*8 + 1 : asg.s*8 + 8], cent.cv)) AS adc_ip
  FROM asg JOIN cent ON cent.s = asg.s AND cent.j = asg.j, q
  GROUP BY asg.vec_id),
cand AS (SELECT vec_id FROM adc ORDER BY adc_ip DESC, vec_id LIMIT 50)
SELECT e.vec_id,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[])) / 1000 AS cos_sim
FROM cand
JOIN embeddings e USING (vec_id),
     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, e.vec_id
LIMIT 10""",

    // Quantizer refresh (q158): q148's CTE chain with exactly two edits —
    // the seed-centroid CTE (vec_id < 8) is replaced by the md5-RANKED
    // sampled selection over the corpus (salt 'rf', cid = rank − 1: the
    // Search.sampledCentroids recipe), and the codebook sampling (rk) is
    // restricted to the corpus (the refresh re-trains on vec_id <> 0,
    // the index's content, not the full table). The oracle recomputes
    // the whole refreshed index relationally — retrain, assignment, probe
    // selection, ADC, rescore — and never sees the on-disk lifecycle
    // (v1 store, model marker, directory swap).
    "q158_ivfpq_refresh" ->
      raw"""WITH sc AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
  FROM embeddings),
c AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)) END AS codes
  FROM sc),
rk AS (
  SELECT sub.s, c.vec_id,
    row_number() OVER (PARTITION BY sub.s
      ORDER BY ('0x' || substr(md5(sub.s::VARCHAR || '|' || c.vec_id::VARCHAR), 1, 15))::BIGINT,
               c.vec_id) AS rk
  FROM c, (SELECT unnest(generate_series(0, 7)) AS s) sub
  WHERE c.vec_id <> 0),
cent AS (
  SELECT rk.s, rk.rk - 1 AS j, c.codes[rk.s*8 + 1 : rk.s*8 + 8] AS cv
  FROM rk JOIN c ON c.vec_id = rk.vec_id
  WHERE rk.rk <= 16),
cents AS (
  SELECT CAST(rn - 1 AS INT) AS cid, embedding AS cv FROM (
    SELECT vec_id, embedding,
      row_number() OVER (
        ORDER BY ('0x' || substr(md5('rf|' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                 vec_id) AS rn
    FROM embeddings WHERE vec_id <> 0) WHERE rn <= 8),
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT e.vec_id, cc.cid,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM embeddings e CROSS JOIN cents cc WHERE e.vec_id <> 0)
  WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT cc.cid,
      row_number() OVER (ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM cents cc, (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
  WHERE rn <= 4),
asg0 AS (
  SELECT c.vec_id, cent.s, cent.j,
    list_inner_product(cent.cv, cent.cv)
      - 2 * list_inner_product(c.codes[cent.s*8 + 1 : cent.s*8 + 8], cent.cv) AS d
  FROM c, cent
  WHERE c.vec_id <> 0
    AND c.vec_id IN (SELECT a.vec_id FROM assigned a JOIN probes p ON a.cluster_id = p.cid)),
asg AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS r
    FROM asg0) WHERE r = 1),
q AS (SELECT codes FROM c WHERE vec_id = 0),
adc AS (
  SELECT asg.vec_id,
    sum(list_inner_product(q.codes[asg.s*8 + 1 : asg.s*8 + 8], cent.cv)) AS adc_ip
  FROM asg JOIN cent ON cent.s = asg.s AND cent.j = asg.j, q
  GROUP BY asg.vec_id),
cand AS (SELECT vec_id FROM adc ORDER BY adc_ip DESC, vec_id LIMIT 50)
SELECT e.vec_id,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[])) / 1000 AS cos_sim
FROM cand
JOIN embeddings e USING (vec_id),
     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, e.vec_id
LIMIT 10""",

    // Incremental-update composition (q149): the oracle NEVER sees the
    // incremental path — it recomputes BM25 (q72's formula, the v2
    // corpus) and the frozen-centroid IVF probe (q30/q148's assignment
    // CTEs, nProbe=4) from the relationally-defined v2 state, so a
    // hash match proves remove+append under frozen models ≡ fresh build
    // end to end, cross-engine.
    "q149_incremental_update" ->
      raw"""WITH v2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 = 4
         THEN text || ' refreshed section about vector search ranking'
         ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 3
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
    'added document about bm25 ranking and ivf retrieval number ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 10 = 7),
tk AS (SELECT doc_id, $toks AS tk FROM v2),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)::DOUBLE) AS avgdl FROM tk),
hits AS (
  SELECT doc_id, len(tk) AS dl, t.term, count(*)::DOUBLE AS tf
  FROM tk, unnest(tk) AS t(term)
  WHERE t.term IN ('bm25', 'vector', 'search')
  GROUP BY doc_id, len(tk), t.term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term),
bmscored AS (
  SELECT doc_id, CAST(sum(CAST(
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (h.tf * 2.2) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))
    AS DECIMAL(24,12))) AS DOUBLE) AS score
  FROM hits h JOIN dfreq d USING (term), stats s
  GROUP BY doc_id),
bmtop AS (
  SELECT 'bm25' AS src, doc_id AS rid, floor(1000 * score) / 1 AS score_m
  FROM bmscored ORDER BY score DESC, doc_id LIMIT 10),
v2e AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id <> 0 AND vec_id % 10 <> 3 AND vec_id % 10 <> 4
  UNION ALL
  SELECT vec_id, list_reverse(embedding) FROM embeddings
  WHERE vec_id <> 0 AND vec_id % 10 = 4
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> -x) FROM embeddings
  WHERE vec_id <> 0 AND vec_id % 10 = 7),
cents AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cid AS cluster_id, embedding FROM (
    SELECT e.vec_id, cc.cid, e.embedding,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM v2e e CROSS JOIN cents cc)
  WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT cc.cid,
      row_number() OVER (ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM cents cc, (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
  WHERE rn <= 4),
ivtop AS (
  SELECT 'ivf' AS src, a.vec_id AS rid,
    floor(1000 * list_cosine_similarity(a.embedding::DOUBLE[], qe.embedding::DOUBLE[])) / 1 AS score_m
  FROM assigned a JOIN probes p ON a.cluster_id = p.cid,
       (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
  ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, a.vec_id
  LIMIT 10)
SELECT src, rid, score_m
FROM (SELECT * FROM bmtop UNION ALL SELECT * FROM ivtop)
ORDER BY src, score_m DESC, rid""",

    // Streaming session-window twin (q150): gaps-and-islands per user at
    // integer-ms grain — islands break when the gap strictly exceeds
    // 300000 ms (the state machine merges iff delta ≤ gap), and only
    // sessions whose end + gap lies STRICTLY below the user's own high
    // water (the per-key analog of a watermark) have closed by the end of
    // the drain. Duplicate-timestamp ordering inside the lag window is
    // immaterial: a zero delta never breaks an island whichever row
    // comes first.
    "q150_session_drain" ->
      raw"""WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE user_id < 100),
o AS (
  SELECT user_id, ms,
    CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) > 300000
         THEN 1 ELSE 0 END AS brk,
    max(ms) OVER (PARTITION BY user_id) AS hw
  FROM e),
s AS (
  SELECT user_id, ms, hw,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o),
g AS (
  SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
    count(*) AS n, max(hw) AS hw
  FROM s GROUP BY user_id, sid)
SELECT user_id, session_start_ms, session_end_ms, n
FROM g WHERE session_end_ms + 300000 < hw
ORDER BY user_id, session_start_ms""",

    // Residual IVF-PQ ANN (q151): the original IVFADC encoding replayed
    // end to end in the GLOBAL fixed-point space fp(x) = floor(x·127+0.5)
    // (one shared scale — integer code differences ARE scaled vector
    // differences, unlike q148's per-vector i8 space). fp = codes, cents =
    // the vec_id<8 seeds with their fp codes, assigned = q148's cosine
    // argmax (ties → lowest cid), res = fp(v) − fp(centroid) element-wise,
    // rk/cent = the q130 md5-ranked SAMPLED codebooks but over the
    // RESIDUAL space (same row selection — the ranking hashes only ids),
    // asg = per-subspace argmin of c·c − 2·(sub·c) over the residual
    // (ties → lowest j), restricted to the nProbe=4 probed clusters. ADC
    // = the residual decomposition fp(q)·v̂ = fp(q)·fp(c) + fp(q)·r̂: one
    // shared table term (tbl = Σ_s fp(q)_s · cent_cv) plus the per-cluster
    // offset fp(q)·fp(c) — all integer-exact. Top-50 by (adc DESC,
    // vec_id), exact-cosine rescore top-10 (the q15 output discipline).
    "q151_ivf_pq_residual" ->
      raw"""WITH fp AS (
  SELECT vec_id, embedding,
    list_transform(embedding, x -> floor(x::DOUBLE * 127.0 + 0.5)) AS codes
  FROM embeddings),
cents AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cv,
    list_transform(embedding, x -> floor(x::DOUBLE * 127.0 + 0.5)) AS cfp
  FROM embeddings WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT f.vec_id, cc.cid,
      row_number() OVER (PARTITION BY f.vec_id
        ORDER BY list_cosine_similarity(f.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM fp f CROSS JOIN cents cc)
  WHERE rn = 1),
res AS (
  SELECT f.vec_id, a.cluster_id,
    list_transform(range(1, 65), i -> f.codes[i] - cc.cfp[i]) AS r
  FROM fp f JOIN assigned a USING (vec_id) JOIN cents cc ON cc.cid = a.cluster_id),
rk AS (
  SELECT sub.s, f.vec_id,
    row_number() OVER (PARTITION BY sub.s
      ORDER BY ('0x' || substr(md5(sub.s::VARCHAR || '|' || f.vec_id::VARCHAR), 1, 15))::BIGINT,
               f.vec_id) AS rk
  FROM fp f, (SELECT unnest(generate_series(0, 7)) AS s) sub),
cent AS (
  SELECT rk.s, rk.rk - 1 AS j, res.r[rk.s*8 + 1 : rk.s*8 + 8] AS cv
  FROM rk JOIN res ON res.vec_id = rk.vec_id
  WHERE rk.rk <= 16),
probes AS (
  SELECT cid FROM (
    SELECT cc.cid,
      row_number() OVER (ORDER BY list_cosine_similarity(qe.embedding::DOUBLE[], cc.cv::DOUBLE[]) DESC, cc.cid) AS rn
    FROM cents cc, (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
  WHERE rn <= 4),
asg0 AS (
  SELECT res.vec_id, cent.s, cent.j,
    list_inner_product(cent.cv, cent.cv)
      - 2 * list_inner_product(res.r[cent.s*8 + 1 : cent.s*8 + 8], cent.cv) AS d
  FROM res, cent
  WHERE res.vec_id <> 0
    AND res.cluster_id IN (SELECT cid FROM probes)),
asg AS (
  SELECT vec_id, s, j FROM (
    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS r
    FROM asg0) WHERE r = 1),
qfp AS (SELECT codes FROM fp WHERE vec_id = 0),
adc AS (
  SELECT asg.vec_id,
    sum(list_inner_product(qfp.codes[asg.s*8 + 1 : asg.s*8 + 8], cent.cv)) AS tbl
  FROM asg JOIN cent ON cent.s = asg.s AND cent.j = asg.j, qfp
  GROUP BY asg.vec_id),
scored AS (
  SELECT adc.vec_id, adc.tbl + list_inner_product(qfp.codes, cc.cfp) AS adc_ip
  FROM adc JOIN res ON res.vec_id = adc.vec_id
    JOIN cents cc ON cc.cid = res.cluster_id, qfp),
cand AS (SELECT vec_id FROM scored ORDER BY adc_ip DESC, vec_id LIMIT 50)
SELECT e.vec_id,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[])) / 1000 AS cos_sim
FROM cand
JOIN embeddings e USING (vec_id),
     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, e.vec_id
LIMIT 10""",

    // Per-group quality cards (q138): exact per-(lang, column) metrics —
    // one grouped SELECT per profiled column, same canonicalization as
    // q134; NULLS FIRST pins group ordering to Spark's asc default.
    "q138_profile_by_group" ->
      raw"""SELECT grp, "column", n_rows, n_non_null, n_null, n_distinct,
  min_value, max_value
FROM (
  SELECT lang AS grp, 'n_chars' AS "column", count(*) AS n_rows,
    count(n_chars) AS n_non_null, count(*) - count(n_chars) AS n_null,
    count(DISTINCT n_chars) AS n_distinct,
    CAST(min(n_chars) AS VARCHAR) AS min_value,
    CAST(max(n_chars) AS VARCHAR) AS max_value
  FROM documents GROUP BY lang
  UNION ALL
  SELECT lang, 'source', count(*), count(source), count(*) - count(source),
    count(DISTINCT source), CAST(min(source) AS VARCHAR),
    CAST(max(source) AS VARCHAR)
  FROM documents GROUP BY lang
) ORDER BY grp NULLS FIRST, "column"""",

    // Profile diff (q139): both quality cards and the full-outer metric
    // comparison replayed in SQL — the diff is data-derived, not
    // hardcoded.
    "q139_profile_diff" ->
      raw"""WITH src_b AS (SELECT * FROM documents),
src_a AS (SELECT * FROM documents WHERE doc_id < 100),
card_b AS (
  SELECT 'doc_id' AS "column", count(*) AS n_rows, count(doc_id) AS n_non_null,
    count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
    CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
  FROM src_b
  UNION ALL
  SELECT 'lang', count(*), count(lang), count(*) - count(lang),
    count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM src_b
  UNION ALL
  SELECT 'n_chars', count(*), count(n_chars), count(*) - count(n_chars),
    count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM src_b
  UNION ALL
  SELECT 'source', count(*), count(source), count(*) - count(source),
    count(DISTINCT source), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM src_b
),
card_a AS (
  SELECT 'doc_id' AS "column", count(*) AS n_rows, count(doc_id) AS n_non_null,
    count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
    CAST(min(doc_id) AS VARCHAR) AS min_value, CAST(max(doc_id) AS VARCHAR) AS max_value
  FROM src_a
  UNION ALL
  SELECT 'lang', count(*), count(lang), count(*) - count(lang),
    count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM src_a
  UNION ALL
  SELECT 'n_chars', count(*), count(n_chars), count(*) - count(n_chars),
    count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM src_a
  UNION ALL
  SELECT 'source', count(*), count(source), count(*) - count(source),
    count(DISTINCT source), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM src_a
),
up_b AS (
  SELECT "column", 'n_rows' AS metric, CAST(n_rows AS VARCHAR) AS before FROM card_b
  UNION ALL SELECT "column", 'n_non_null', CAST(n_non_null AS VARCHAR) FROM card_b
  UNION ALL SELECT "column", 'n_null', CAST(n_null AS VARCHAR) FROM card_b
  UNION ALL SELECT "column", 'n_distinct', CAST(n_distinct AS VARCHAR) FROM card_b
  UNION ALL SELECT "column", 'min_value', min_value FROM card_b
  UNION ALL SELECT "column", 'max_value', max_value FROM card_b
),
up_a AS (
  SELECT "column", 'n_rows' AS metric, CAST(n_rows AS VARCHAR) AS after FROM card_a
  UNION ALL SELECT "column", 'n_non_null', CAST(n_non_null AS VARCHAR) FROM card_a
  UNION ALL SELECT "column", 'n_null', CAST(n_null AS VARCHAR) FROM card_a
  UNION ALL SELECT "column", 'n_distinct', CAST(n_distinct AS VARCHAR) FROM card_a
  UNION ALL SELECT "column", 'min_value', min_value FROM card_a
  UNION ALL SELECT "column", 'max_value', max_value FROM card_a
)
SELECT COALESCE(up_b."column", up_a."column") AS "column",
  COALESCE(up_b.metric, up_a.metric) AS metric, up_b.before, up_a.after
FROM up_b FULL OUTER JOIN up_a
  ON up_b."column" = up_a."column" AND up_b.metric = up_a.metric
WHERE up_b.before IS DISTINCT FROM up_a.after
ORDER BY "column", metric""",

    // Scale/thumbnail-tolerant image dedup (q136): 25 dHash-diverse
    // blocked PNGs staged as (full, exact 2x-downscale, restage); dHash's
    // proportional pooling is arithmetically invariant under the aligned
    // box downscale, so the result is exactly the 75 within-group pairs
    // at Hamming 0.
    "q136_thumbnail_image_dedup" ->
      raw"""SELECT id1, id2, hamming FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 2000 AS id2, CAST(0 AS BIGINT) FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 2000 AS id2, CAST(0 AS BIGINT)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Resample-tolerant audio dedup (q137): 25 envelope-diverse
    // paired-sample WAVs staged as (full, 2x-decimated re-encode,
    // restage); the duration-normalized envelope hash is invariant under
    // the aligned decimation — exactly the 75 within-group pairs.
    "q137_audio_resample_dedup" ->
      raw"""SELECT id1, id2, hamming FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(0 AS BIGINT) AS hamming
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 2000 AS id2, CAST(0 AS BIGINT) FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 2000 AS id2, CAST(0 AS BIGINT)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Speed/fps-change-tolerant video dedup (q133): 24 speed-diverse
    // 12-frame clips staged as (full, half-rate duplicate, decoy splice,
    // identical restage). The half-rate dup matches its original 6/6 under
    // the (stride 2, phase 0, offset 0) hypothesis with the ORIGINAL as
    // the decimated side (decimated=1 when the original id is smaller, 2
    // when it is the restage at +3000); the restage matches 12/12 at
    // stride 1; every splice and wrong hypothesis drops (screen margins at
    // the probe's scaladoc).
    "q133_video_speed_dedup" ->
      raw"""SELECT id1, id2, stride, phase, decimated, frame_offset,
  matched_frames, total_frames, vote_frac
FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(2 AS INTEGER) AS stride,
    CAST(0 AS INTEGER) AS phase, CAST(1 AS INTEGER) AS decimated,
    CAST(0 AS INTEGER) AS frame_offset, CAST(6 AS BIGINT) AS matched_frames,
    CAST(6 AS BIGINT) AS total_frames, CAST(1.0 AS DOUBLE) AS vote_frac
  FROM range(24) t(i)
  UNION ALL
  SELECT i AS id1, i + 3000 AS id2, CAST(1 AS INTEGER), CAST(0 AS INTEGER),
    CAST(0 AS INTEGER), CAST(0 AS INTEGER), CAST(12 AS BIGINT),
    CAST(12 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(24) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 3000 AS id2, CAST(2 AS INTEGER),
    CAST(0 AS INTEGER), CAST(2 AS INTEGER), CAST(0 AS INTEGER),
    CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(24) t(i)
) ORDER BY id1, id2""",

    // Dataset quality card (q134): exact per-column row/null/distinct
    // counts and typed min/max over documents — every metric is plain SQL,
    // restricted to types whose string rendering is engine-portable.
    "q134_profile_columns" ->
      raw"""SELECT "column", n_rows, n_non_null, n_null, n_distinct,
  min_value, max_value
FROM (
  SELECT 'doc_id' AS "column", count(*) AS n_rows, count(doc_id) AS n_non_null,
    count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
    CAST(min(doc_id) AS VARCHAR) AS min_value,
    CAST(max(doc_id) AS VARCHAR) AS max_value
  FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(lang), count(*) - count(lang),
    count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(n_chars), count(*) - count(n_chars),
    count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
    CAST(max(n_chars) AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT 'source', count(*), count(source), count(*) - count(source),
    count(DISTINCT source), CAST(min(source) AS VARCHAR),
    CAST(max(source) AS VARCHAR)
  FROM documents
) ORDER BY "column"""",

    // Exact top-k frequent values per column (q135): counts at the
    // (column, value) grain, deterministic ties (count desc, value asc).
    "q135_frequent_values" ->
      raw"""SELECT "column", value, n FROM (
  SELECT 'lang' AS "column", lang AS value, count(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
  UNION ALL
  SELECT 'source', source, count(*) FROM documents
  WHERE source IS NOT NULL GROUP BY source
)
QUALIFY row_number() OVER (PARTITION BY "column" ORDER BY n DESC, value ASC) <= 5
ORDER BY "column", n DESC, value""",

    // Shift-tolerant segment-wise AUDIO dedup (q127): the q126
    // construction over WAV PCM segment envelope hashes — same four-way
    // staging, same fixed 75-row best-offset result (trim 6/8 at offset
    // -2, restage 8/8 at 0, trim-vs-restage 6/8 at +2; every shifted
    // splice 1/8 < 0.7 drops).
    "q127_audio_shifted_dedup" ->
      raw"""SELECT id1, id2, frame_offset, matched_frames, total_frames, vote_frac
FROM (
  SELECT i AS id1, i + 1000 AS id2, CAST(-2 AS INTEGER) AS frame_offset,
    CAST(6 AS BIGINT) AS matched_frames, CAST(8 AS BIGINT) AS total_frames,
    CAST(0.75 AS DOUBLE) AS vote_frac
  FROM range(25) t(i)
  UNION ALL
  SELECT i AS id1, i + 3000 AS id2, CAST(0 AS INTEGER),
    CAST(8 AS BIGINT), CAST(8 AS BIGINT), CAST(1.0 AS DOUBLE)
  FROM range(25) t(i)
  UNION ALL
  SELECT i + 1000 AS id1, i + 3000 AS id2, CAST(2 AS INTEGER),
    CAST(6 AS BIGINT), CAST(8 AS BIGINT), CAST(0.75 AS DOUBLE)
  FROM range(25) t(i)
) ORDER BY id1, id2""",

    // Deterministic corpus shuffle (q113): position = row_number over the
    // q61 sampling hash (salt 'epoch1'), doc_id tie-break — the same
    // permutation Sampling.shuffleOrder's range-exchange rank produces.
    "q113_shuffle_order" ->
      raw"""SELECT doc_id,
row_number() OVER (
  ORDER BY ('0x' || substr(md5('epoch1' || doc_id::VARCHAR), 1, 15))::BIGINT,
           doc_id) AS shuffle_rank
FROM documents ORDER BY shuffle_rank""",

    // Sketch-nominated exact heavy hitters (q114): the sketch path's
    // candidate-then-verify output is EXACT by the no-false-negative
    // guarantee, so the oracle is the full-stream GROUP BY ... HAVING the
    // engine avoids. Same derived skewed stream, integer 1%-of-N threshold
    // (DuckDB // ≡ Spark Long division).
    "q114_heavy_hitters" -> heavyHittersSql,

    // Binned interval join (q115): the operator must be result-identical
    // to the plain range join, so the oracle IS the plain range join —
    // q07's shape with the q115 parameters (±240 s, users < 12).
    "q115_binned_range_join" ->
      raw"""WITH ev AS (SELECT *, epoch_us(ts) AS us FROM events)
SELECT e.event_id AS err_id, count(*) AS n_nearby,
round(CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
FROM ev e JOIN ev p ON p.event_type = 'purchase'
  AND p.us >= e.us - 240000000 AND p.us <= e.us + 240000000
WHERE e.event_type = 'error' AND e.user_id < 12
GROUP BY e.event_id ORDER BY err_id""",

    // Exact prefix-filtered Jaccard join (q116): the operator is sound —
    // not approximate — so the oracle is the brute-force all-pairs join
    // with the same integer cross-multiplied ppm threshold; q23's shingle
    // spelling, q116's subset and θ.
    "q116_jaccard_join" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 800),
shc AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk),
s AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS l FROM shc WHERE len(sh) > 0),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i, a.l + b.l AS lsum
  FROM s a JOIN s b ON a.doc_id < b.doc_id)
SELECT id1, id2, (i * 1000000) // (lsum - i) AS jaccard_ppm
FROM p WHERE i * 1000000 >= 250000 * (lsum - i)
ORDER BY id1, id2""",

    // Weighted sampling (q117): priority = (w · 2^40) // (40-bit md5 hash
    // + 1) — integer quotient, so the ranking replays exactly; ties break
    // on doc_id; w = 0 rows excluded.
    "q117_weighted_sample" ->
      raw"""WITH w AS (
  SELECT doc_id, lang,
    (n_chars * 1099511627776) //
      (('0x' || substr(md5('ws1' || doc_id::VARCHAR), 1, 10))::BIGINT + 1)
      AS priority
  FROM documents WHERE n_chars <> 0),
r AS (
  SELECT lang, doc_id, priority,
    row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id)
      AS sample_rank
  FROM w)
SELECT lang, doc_id, priority, CAST(sample_rank AS INT) AS sample_rank
FROM r WHERE sample_rank <= 25 ORDER BY lang, sample_rank""",

    // Binned interval-overlap join (q118): result-identical to the raw
    // two-sided theta join, so that IS the oracle.
    "q118_overlap_join" ->
      raw"""WITH a AS (
  SELECT l_orderkey, l_linenumber,
         date_diff('day', DATE '1992-01-01', l_shipdate::DATE) AS lo,
         date_diff('day', DATE '1992-01-01', l_shipdate::DATE) + l_linenumber AS hi
  FROM lineitem WHERE l_suppkey = 1),
b AS (
  SELECT date_diff('day', DATE '1992-01-01', l_shipdate::DATE) AS lo,
         date_diff('day', DATE '1992-01-01', l_shipdate::DATE) + l_linenumber AS hi
  FROM lineitem WHERE l_suppkey = 2)
SELECT a.l_orderkey AS a_orderkey, a.l_linenumber AS a_linenumber,
count(*) AS n_overlaps
FROM a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi
GROUP BY 1, 2 ORDER BY 1, 2""",

    // Pinned tf-idf vocabulary (q47, oracle-green since round 6): tokens =
    // the RegexTokenizer twin, minus MLlib's english stopword list (embedded
    // verbatim); vocab = top 128 terms by (df DESC, term ASC) with df ≥ 2;
    // n_active_terms = vocabulary terms present in the doc with idf > 0
    // (idf = ln((N+1)/(df+1)) = 0 ⟺ df = N).
    "q47_tfidf" ->
      raw"""WITH sw(w) AS (VALUES $stopWords),
tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 200),
terms AS (
  SELECT DISTINCT doc_id, t.term FROM tk, unnest(tk) AS t(term)
  WHERE t.term NOT IN (SELECT w FROM sw)),
dfreq AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
vocab AS (
  SELECT term, df FROM dfreq WHERE df >= 2
  ORDER BY df DESC, term ASC LIMIT 128),
nd AS (SELECT count(*) AS n FROM tk),
act AS (
  SELECT t.doc_id, count(*) AS n_active
  FROM terms t JOIN vocab v USING (term), nd
  WHERE v.df < nd.n GROUP BY t.doc_id)
SELECT tk.doc_id, CAST(coalesce(act.n_active, 0) AS INT) AS n_active_terms
FROM tk LEFT JOIN act USING (doc_id) ORDER BY doc_id""",

    // Real-audio-decode probe (q81, the q45 pattern for WAV): Spark encodes
    // formula PCM16 samples as real RIFF containers and decodes them with
    // javax.sound; the oracle recomputes the same |sample| sums straight
    // from the closed-form formula (PCM is lossless ⇒ exact).
    "q81_audio_decode" ->
      raw"""WITH a AS (
  SELECT unnest(generate_series(0, 99)) AS media_id),
aud AS (SELECT media_id FROM a WHERE media_id % 3 = 1),
samp AS (
  SELECT media_id, unnest(generate_series(0, 63 + media_id)) AS i FROM aud)
SELECT media_id,
  CAST(count(*) AS INT) AS n_samples,
  CAST(8000 AS INT) AS sample_rate,
  CAST(sum(abs(((media_id * 73 + i * 37) % 65536) - 32768)) AS BIGINT) AS amp_sum
FROM samp GROUP BY media_id ORDER BY media_id""",

    // C4-style corpus-level line dedup (q82): keep-first per distinct
    // line (window over the LINE VALUE — Spark windows over its sha2,
    // identical classes), rebuild with ORDER BY idx inside string_agg.
    // Line indexes come from generate_series over the split list (no
    // unnest-ordering dependency); blank = space-trimmed empty on BOTH
    // sides (Spark trim ≡ DuckDB trim: 0x20 only).
    "q82_line_dedup" ->
      raw"""WITH d AS (
  SELECT doc_id, regexp_replace(text, ' (table|row) ', chr(10), 'g') AS t
  FROM documents),
ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM d),
l AS (
  SELECT ls.doc_id, i.i AS idx, ls.l[i.i] AS line
  FROM ls, LATERAL (SELECT unnest(generate_series(1, len(ls.l))) AS i) i
  WHERE length(trim(ls.l[i.i])) > 0),
k AS (SELECT doc_id, idx, line,
        row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
      FROM l),
r AS (SELECT doc_id,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
        CAST(count(*) AS INT) AS n_lines,
        string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY idx) AS txt
      FROM k GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(r.n_kept, 0) AS n_kept,
  coalesce(r.n_lines, 0) AS n_lines,
  coalesce(r.txt, '') AS text
FROM d LEFT JOIN r USING (doc_id)
ORDER BY doc_id""",

    // Boilerplate stripping (q83): remove EVERY occurrence of lines whose
    // distinct-doc frequency exceeds 1 (q82's split/blank conventions).
    "q83_boilerplate_strip" ->
      raw"""WITH d AS (
  SELECT doc_id, regexp_replace(text, ' (table|row) ', chr(10), 'g') AS t
  FROM documents),
ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM d),
l AS (
  SELECT ls.doc_id, i.i AS idx, ls.l[i.i] AS line
  FROM ls, LATERAL (SELECT unnest(generate_series(1, len(ls.l))) AS i) i
  WHERE length(trim(ls.l[i.i])) > 0),
f AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
k AS (SELECT l.doc_id, l.idx, l.line, f.df <= 1 AS keep
      FROM l JOIN f USING (line)),
r AS (SELECT doc_id,
        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
        CAST(count(*) AS INT) AS n_lines,
        string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY idx) AS txt
      FROM k GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(r.n_kept, 0) AS n_kept,
  coalesce(r.n_lines, 0) AS n_lines,
  coalesce(r.txt, '') AS text
FROM d LEFT JOIN r USING (doc_id)
ORDER BY doc_id""",

    // Gopher repetition metrics (q84): overlapping n-grams over the shared
    // tokenization; most-frequent ties resolve to larger coverage (the
    // Spark max(struct(cnt, cov)) rule ≡ max cov among cnt = per-doc max);
    // ppm is an exact integer quotient (// here, scaled-minus-pmod there).
    "q84_ngram_repetition" ->
      raw"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
tot AS (SELECT doc_id,
  CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS tchars
  FROM t),
g2 AS (SELECT t.doc_id, array_to_string(toks[i.i:i.i+1], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) i),
c2 AS (SELECT doc_id, gram, count(*) AS cnt,
         CAST(length(gram) - 1 AS BIGINT) AS gchars
       FROM g2 GROUP BY doc_id, gram),
c2w AS (SELECT *, max(cnt) OVER (PARTITION BY doc_id) AS mx FROM c2),
p2 AS (SELECT doc_id,
         CAST(max(CASE WHEN cnt = mx THEN cnt * gchars END) AS BIGINT) AS topcov,
         CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt * gchars END), 0) AS BIGINT) AS dupcov
       FROM c2w GROUP BY doc_id),
g5 AS (SELECT t.doc_id, array_to_string(toks[i.i:i.i+4], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 4)) AS i) i),
c5 AS (SELECT doc_id, gram, count(*) AS cnt,
         CAST(length(gram) - 4 AS BIGINT) AS gchars
       FROM g5 GROUP BY doc_id, gram),
c5w AS (SELECT *, max(cnt) OVER (PARTITION BY doc_id) AS mx FROM c5),
p5 AS (SELECT doc_id,
         CAST(max(CASE WHEN cnt = mx THEN cnt * gchars END) AS BIGINT) AS topcov,
         CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt * gchars END), 0) AS BIGINT) AS dupcov
       FROM c5w GROUP BY doc_id)
SELECT tot.doc_id,
  CASE WHEN tchars > 0 THEN least(coalesce(p2.topcov, 0) * 1000000 // tchars, 1000000) ELSE 0 END AS top2_ppm,
  CASE WHEN tchars > 0 THEN least(coalesce(p2.dupcov, 0) * 1000000 // tchars, 1000000) ELSE 0 END AS dup2_ppm,
  CASE WHEN tchars > 0 THEN least(coalesce(p5.topcov, 0) * 1000000 // tchars, 1000000) ELSE 0 END AS top5_ppm,
  CASE WHEN tchars > 0 THEN least(coalesce(p5.dupcov, 0) * 1000000 // tchars, 1000000) ELSE 0 END AS dup5_ppm
FROM tot LEFT JOIN p2 USING (doc_id) LEFT JOIN p5 USING (doc_id)
ORDER BY doc_id""",

    // ExactSubstr duplicate-span removal (q85): duplicated 10-token
    // windows mark non-canonical occurrences' positions (rn > 1 over
    // (doc_id, p) ≡ Spark's min(struct) exemption); covered positions are
    // dropped, docs rebuilt token-ordered. Grouping is on the window TEXT
    // here vs its sha2 there — identical classes.
    "q85_duplicate_spans" ->
      raw"""WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
o AS (SELECT t.doc_id, i.i AS p, array_to_string(toks[i.i:i.i+9], ' ') AS g
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 9)) AS i) i),
ow AS (SELECT doc_id, p,
         count(*) OVER (PARTITION BY g) AS cnt,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
       FROM o),
cov AS (SELECT DISTINCT doc_id, i.i AS pos
        FROM ow, LATERAL (SELECT unnest(generate_series(p, p + 9)) AS i) i
        WHERE cnt > 1 AND rn > 1),
tok AS (SELECT t.doc_id, i.i AS pos, toks[i.i] AS tok
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) i),
k AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok ANTI JOIN cov USING (doc_id, pos)),
r AS (SELECT doc_id, CAST(count(*) AS INT) AS n_kept_tokens,
        string_agg(tok, ' ' ORDER BY pos) AS txt
      FROM k GROUP BY doc_id)
SELECT t.doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  coalesce(r.n_kept_tokens, 0) AS n_kept_tokens,
  coalesce(r.txt, '') AS text
FROM t LEFT JOIN r USING (doc_id)
ORDER BY doc_id""",

    // DSIR importance weights (q86): hashed uni+bigram buckets (portable
    // md5-60-bit % 1024), add-one-smoothed target/corpus probabilities,
    // ln of the ratio with the EXACT expression shape of the Spark side,
    // DECIMAL(24,12) per-doc sums, milli-floored (the q77 discipline).
    "q86_dsir_weights" ->
      raw"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
f AS (
  SELECT doc_id, u.f
  FROM t, LATERAL (
    SELECT unnest(list_concat(toks,
      CASE WHEN len(toks) >= 2
        THEN list_transform(generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])
        ELSE []::VARCHAR[] END)) AS f) u),
bk AS (SELECT doc_id, ('0x' || substr(md5(f), 1, 15))::BIGINT % 1024 AS b FROM f),
tc AS (SELECT b, count(*) AS tc FROM bk WHERE doc_id < 50 GROUP BY b),
cc AS (SELECT b, count(*) AS cc FROM bk GROUP BY b),
tt AS (SELECT sum(tc) AS ttot FROM tc),
ct AS (SELECT sum(cc) AS ctot FROM cc),
w AS (SELECT cc.b,
        ln(((coalesce(tc.tc, 0) + 1.0) / (tt.ttot + 1024)) /
           ((cc.cc + 1.0) / (ct.ctot + 1024))) AS w
      FROM cc LEFT JOIN tc USING (b), tt, ct),
s AS (SELECT bk.doc_id, CAST(count(*) AS INT) AS n_feats,
        CAST(sum(CAST(w.w AS DECIMAL(24,12))) AS DOUBLE) AS weight
      FROM bk JOIN w USING (b) GROUP BY bk.doc_id)
SELECT d.doc_id,
  coalesce(s.n_feats, 0) AS n_feats,
  floor(coalesce(s.weight, 0.0) * 1000) / 1 AS w_m
FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING (doc_id)
ORDER BY doc_id""",

    // SemDeDup (q87): q30's seed-centroid argmax assignment, within-cluster
    // cosine pairs >= 0.45, components via recursive transitive closure
    // (min reachable id ≡ Spark's min-label propagation at convergence),
    // losers anti-joined away.
    "q87_semantic_dedup" ->
      raw"""WITH RECURSIVE c AS (
  SELECT CAST(vec_id AS INT) AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
a AS (
  SELECT vec_id, cid, embedding FROM (
    SELECT e.vec_id, c.cid, e.embedding,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC, c.cid) AS r
    FROM embeddings e, c) t WHERE r = 1),
p AS (SELECT x.vec_id AS id1, y.vec_id AS id2
      FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
      WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.45),
e2 AS (SELECT id1 AS s, id2 AS d FROM p UNION ALL SELECT id2 AS s, id1 AS d FROM p),
reach(s, d) AS (
  SELECT s, d FROM e2
  UNION
  SELECT r.s, e2.d FROM reach r JOIN e2 ON r.d = e2.s),
losers AS (SELECT s AS id FROM reach GROUP BY s HAVING least(s, min(d)) <> s)
SELECT vec_id FROM embeddings ANTI JOIN losers ON vec_id = losers.id
ORDER BY vec_id""",

    // Curation funnel (q88): q66's rule arithmetic (raw, unfloored, over
    // ALL docs) gates q77's trigram scorer (model on doc_id >= 100); the
    // top half of survivors by (avg_logp desc, doc_id) keeps — rnk·2 ≤ m+1
    // is the integer ⌈m/2⌉ cut on both sides. Ranking on the raw double is
    // safe: avg_logp = exact-decimal-sum / count, bit-identical engines.
    "q88_curation_funnel" ->
      raw"""WITH d AS (
  SELECT doc_id, text, $toks AS tk,
    list_filter(
      list_transform(string_split(text, chr(10)),
        l -> regexp_replace(l, '^\s+|\s+$$', '', 'g')),
      l -> length(l) > 0) AS ls
  FROM documents),
m AS (
  SELECT doc_id, text,
    CAST(len(tk) AS INT) AS word_cnt,
    CASE WHEN len(tk) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) END AS mwl,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS dlr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE) / len(ls) END AS blr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.$$'))) AS DOUBLE) / len(ls) END AS elr,
    len(list_intersect(tk, ['the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','be','this'])) AS stop_hits
  FROM d),
g AS (
  SELECT doc_id, text,
    CASE WHEN word_cnt >= 50 AND word_cnt <= 100000
          AND mwl >= 3.0 AND mwl <= 10.0
          AND dlr < 0.3 AND blr < 0.9 AND elr < 0.3
          AND stop_hits >= 2 THEN 1 ELSE 0 END AS gopher_pass
  FROM m),
ref AS (SELECT text AS t FROM documents WHERE doc_id >= 100),
rt AS (
  SELECT unnest(list_transform(generate_series(1, length(t) - 2), i -> lower(substr(t, i, 3)))) AS tri
  FROM ref WHERE length(t) >= 3),
m0 AS (SELECT tri, count(*) AS n_tri FROM rt GROUP BY tri),
mdl AS (
  SELECT tri,
    ln(n_tri::DOUBLE / sum(n_tri) OVER (PARTITION BY substr(tri, 1, 2))) AS logp
  FROM m0),
sd AS (SELECT doc_id, text FROM g WHERE gopher_pass = 1 AND length(text) >= 3),
dt AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, length(text) - 2), i -> lower(substr(text, i, 3)))) AS tri
  FROM sd),
sc AS (
  SELECT doc_id,
    CAST(sum(CAST(coalesce(mdl.logp, -23.025850929940457) AS DECIMAL(24,12))) AS DOUBLE) / count(*) AS avg_logp
  FROM dt LEFT JOIN mdl USING (tri) GROUP BY doc_id),
rk AS (
  SELECT doc_id, avg_logp,
    row_number() OVER (ORDER BY avg_logp DESC, doc_id) AS rnk,
    count(*) OVER () AS mm
  FROM sc)
SELECT g.doc_id,
  g.gopher_pass,
  coalesce(floor(rk.avg_logp * 1000) / 1, -999999.0) AS lp_m,
  coalesce(rk.rnk, 0) AS rnk,
  CASE WHEN rk.rnk IS NOT NULL AND rk.rnk * 2 <= rk.mm + 1 THEN 1 ELSE 0 END AS kept
FROM g LEFT JOIN rk USING (doc_id)
ORDER BY doc_id""",

    // Native NFC expression vs DuckDB nfc_normalize (q89): the combining
    // acute (chr(769)) is appended on both sides so composition really
    // happens; md5 of the normalized bytes compares.
    "q89_nfc_normalize" ->
      raw"""SELECT doc_id,
md5(nfc_normalize(text || ' cafe' || chr(769) || ' test')) AS nfc_md5
FROM documents ORDER BY doc_id""",

    // Correlated scalar subquery (TPC-H Q17 shape). Quantities are
    // integer-valued doubles so avg is order-independent and exact in both
    // engines; revenue sums go through DECIMAL(18,2).
    "q90_correlated_scalar" ->
      raw"""SELECT p_brand,
CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_lowqty_price,
count(*) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
GROUP BY p_brand ORDER BY p_brand""",

    // Correlated EXISTS (TPC-H Q4 shape) — rewritten to a semi join by
    // both engines.
    "q91_exists_subquery" ->
      raw"""SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Binary sign-bit codes: fixture dim 64 = one BIGINT word. DuckDB's
    // `1 << 63` overflows, so bit 63 is spelled as the min-long literal
    // (Spark's shiftleft wraps to the same value); bit_or packs the word,
    // XOR+bit_count is the Hamming distance. Rescore order on the raw
    // cosine double is the q30-proven cross-engine path.
    "q92_binary_hamming" ->
      raw"""WITH bits AS (
  SELECT vec_id,
    CASE WHEN embedding[i+1] >= 0 THEN
      CASE WHEN i = 63 THEN (-9223372036854775807 - 1)::BIGINT
           ELSE (1::BIGINT << i) END
    ELSE 0::BIGINT END AS bitv
  FROM (SELECT vec_id, embedding, unnest(generate_series(0, 63)) AS i FROM embeddings)),
codes AS (SELECT vec_id, bit_or(bitv) AS code FROM bits GROUP BY vec_id),
q AS (SELECT code AS qcode FROM codes WHERE vec_id = 0),
qv AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT c.vec_id, CAST(bit_count(xor(c.code, q.qcode)) AS BIGINT) AS hamming
  FROM codes c, q WHERE c.vec_id <> 0
  ORDER BY hamming, c.vec_id LIMIT 20)
SELECT cand.vec_id, cand.hamming,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qv.qemb::DOUBLE[])) AS cos_m
FROM cand, embeddings e, qv WHERE e.vec_id = cand.vec_id
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qv.qemb::DOUBLE[]) DESC, cand.vec_id
LIMIT 5""",

    // Matryoshka funnel: prefix slice embedding[1:16], cosine shortlist,
    // full-dim rescore — list slicing is 1-based-inclusive in DuckDB,
    // matching Spark's slice(v, 1, 16).
    "q93_matryoshka_funnel" ->
      raw"""WITH qv AS (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id,
    list_cosine_similarity(e.embedding[1:16]::DOUBLE[], qv.qemb[1:16]::DOUBLE[]) AS prefix_score
  FROM embeddings e, qv WHERE e.vec_id <> 0
  ORDER BY prefix_score DESC, e.vec_id LIMIT 20)
SELECT cand.vec_id,
  floor(1000 * cand.prefix_score) AS cosp_m,
  floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], qv.qemb::DOUBLE[])) AS cos_m
FROM cand, embeddings e, qv WHERE e.vec_id = cand.vec_id
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qv.qemb::DOUBLE[]) DESC, cand.vec_id
LIMIT 5""",

    // Temperature mixing: thresholds re-derived with the same IEEE double
    // steps the driver-side Scala takes (count/total, pow ·^0.5, min,
    // k·q/n, floor·2^60 — the q79-proven arithmetic family); the kept-id
    // md5 pins row-level agreement, not just counts.
    "q94_temperature_mix" ->
      raw"""WITH g AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM g),
qv AS (SELECT lang, n, pow(n / tot.total, 0.5) AS q FROM g, tot),
kv AS (SELECT min(n / q) AS k FROM qv),
th AS (SELECT lang,
  CAST(floor(least(1.0, kv.k * q / n) * 1152921504606846976) AS BIGINT) AS thr
  FROM qv, kv)
SELECT d.lang, count(*) AS n_kept,
  md5(string_agg(d.doc_id::VARCHAR, ',' ORDER BY d.doc_id)) AS kept_ids_md5
FROM documents d JOIN th USING (lang)
WHERE ('0x' || substr(md5('temp1' || d.doc_id::VARCHAR), 1, 15))::BIGINT < th.thr
GROUP BY d.lang ORDER BY d.lang""",

    // Inverted index: identical tokens, df counted before the per-term
    // cap (rn <= 10), postings serialized in doc-id order.
    "q95_inverted_index" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
tf AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
       FROM tk, unnest(tk) AS t(term) GROUP BY doc_id, t.term),
d AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
capped AS (
  SELECT term, doc_id, tf,
    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM tf)
SELECT c.term, d.df, CAST(count(*) AS INT) AS n_kept,
  string_agg(c.doc_id::VARCHAR || ':' || c.tf::VARCHAR, ',' ORDER BY c.doc_id) AS postings_str
FROM capped c JOIN d USING (term)
WHERE d.df >= 60 AND c.rn <= 10
GROUP BY c.term, d.df ORDER BY c.term""",

    // TPC-H Q22 shape: one-shot scalar threshold (exact decimal sum /
    // count — identical double both engines) + NOT EXISTS anti join.
    "q96_scalar_anti" ->
      raw"""SELECT c_mktsegment, count(*) AS n_cust,
CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // BM25 via the persisted index reads the same df/tf/dl/stats the
    // direct q72 computation derives, so the oracle recomputes from the
    // corpus; top-10 on the raw decimal-summed score, ties by doc id.
    "q97_bm25_from_index" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)::DOUBLE) AS avgdl FROM tk),
hits AS (
  SELECT doc_id, len(tk) AS dl, t.term, count(*)::DOUBLE AS tf
  FROM tk, unnest(tk) AS t(term)
  WHERE t.term IN ('data', 'model', 'search')
  GROUP BY doc_id, len(tk), t.term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term),
scored AS (
  SELECT doc_id, CAST(sum(CAST(
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (h.tf * 2.2) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))
    AS DECIMAL(24,12))) AS DOUBLE) AS score
  FROM hits h JOIN dfreq d USING (term), stats s
  GROUP BY doc_id)
SELECT doc_id, floor(1000 * score) / 1 AS score_m
FROM scored ORDER BY score DESC, doc_id LIMIT 10""",

    // BM25 through the append-then-compact lifecycle (q161): SAME SQL as
    // q97 — the oracle recomputes from the corpus and never sees the
    // write/append/compact layout maintenance, so the hash match proves
    // the compacted store serves the direct computation's exact answers.
    "q161_bm25_compacted" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)::DOUBLE) AS avgdl FROM tk),
hits AS (
  SELECT doc_id, len(tk) AS dl, t.term, count(*)::DOUBLE AS tf
  FROM tk, unnest(tk) AS t(term)
  WHERE t.term IN ('data', 'model', 'search')
  GROUP BY doc_id, len(tk), t.term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term),
scored AS (
  SELECT doc_id, CAST(sum(CAST(
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (h.tf * 2.2) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))
    AS DECIMAL(24,12))) AS DOUBLE) AS score
  FROM hits h JOIN dfreq d USING (term), stats s
  GROUP BY doc_id)
SELECT doc_id, floor(1000 * score) / 1 AS score_m
FROM scored ORDER BY score DESC, doc_id LIMIT 10""",

    // z-order key (q98): same integer bit math as Layout.zValue/gridCoord —
    // multiply-before-divide grid scaling (// = floor division; operands
    // non-negative, so it matches Spark's truncating long division), then
    // bit b of column i lands at position b*2+i. The term list is generated
    // below (zTerms2x8) from the identical (b, i) loop the Scala side uses.
    "q98_zorder_key" ->
      raw"""WITH bounds AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem),
g AS (
  SELECT l_orderkey, l_linenumber,
    (l_partkey - pmin) * 255 // (pmax - pmin) AS px,
    (l_suppkey - smin) * 255 // (smax - smin) AS sx
  FROM lineitem, bounds)
SELECT l_orderkey, l_linenumber, $zTerms2x8 AS z
FROM g ORDER BY z, l_orderkey, l_linenumber LIMIT 128""",

    // MMR re-rank (q99): the greedy argmax as a recursive CTE carrying the
    // picked-list. Tie order matches the Scala loop exactly — candidates
    // iterate (rel DESC, id ASC) with strict >, i.e. ties resolve to the
    // higher rel then lower id, hence ORDER BY score DESC, rel DESC, id.
    // (1.0 - 0.7) spelled as an expression, not 0.3: IEEE 1-0.7 is
    // 0.30000000000000004 and both engines must use THAT value.
    "q99_mmr_rerank" ->
      raw"""WITH RECURSIVE q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
cand0 AS (
  SELECT q.query_id, e.vec_id AS id, e.embedding AS v,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS rel
  FROM embeddings e, q WHERE e.vec_id >= 3),
c AS (
  SELECT query_id, id, v, rel FROM (
    SELECT cand0.*, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS rnk
    FROM cand0)
  WHERE rnk <= 20),
sel AS (
  SELECT query_id, 0 AS step, CAST([] AS BIGINT[]) AS picked
  FROM (SELECT DISTINCT query_id FROM c)
  UNION ALL
  SELECT s.query_id, s.step + 1,
    list_append(s.picked, (
      SELECT cc.id FROM c cc
      WHERE cc.query_id = s.query_id AND NOT list_contains(s.picked, cc.id)
      ORDER BY 0.7 * cc.rel - (1.0 - 0.7) * coalesce((
          SELECT max(list_cosine_similarity(cc.v::DOUBLE[], p.v::DOUBLE[]))
          FROM c p WHERE p.query_id = s.query_id AND list_contains(s.picked, p.id)), 0.0) DESC,
        cc.rel DESC, cc.id ASC
      LIMIT 1))
  FROM sel s WHERE s.step < 5),
fin AS (SELECT query_id, picked FROM sel WHERE step = 5),
ranked AS (
  SELECT f.query_id, CAST(gs.i AS INT) AS "rank",
         list_extract(f.picked, CAST(gs.i AS INT)) AS vec_id, f.picked
  FROM fin f, (SELECT unnest(generate_series(1, 5)) AS i) gs)
SELECT r.query_id, r."rank", r.vec_id,
  floor(1000 * (0.7 * cc.rel - (1.0 - 0.7) * coalesce((
    SELECT max(list_cosine_similarity(cc.v::DOUBLE[], p.v::DOUBLE[]))
    FROM c p WHERE p.query_id = r.query_id
      AND list_contains(list_slice(r.picked, 1, r."rank" - 1), p.id)), 0.0))) / 1 AS mmr_m
FROM ranked r JOIN c cc ON cc.query_id = r.query_id AND cc.id = r.vec_id
ORDER BY r.query_id, r."rank"""",

    // snapshot delta (q100): statuses come from WITHIN-engine fingerprint
    // equality (sha256 both sides), so no cross-engine hash parity is
    // required; counts and id sums are exact integers.
    "q100_snapshot_delta" ->
      raw"""WITH old AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN substring(text, 1, 100) ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0),
cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3),
d AS (
  SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
    CASE WHEN o.doc_id IS NULL THEN 'added'
         WHEN c.doc_id IS NULL THEN 'removed'
         WHEN sha256(o.text) = sha256(c.text) THEN 'unchanged'
         ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id)
SELECT status, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM d GROUP BY status ORDER BY status""",

    // n-way split assignment (q101): thresholds below are computed by the
    // SAME double arithmetic Sampling.assignSplit uses (cumulative weight ×
    // 2^60, truncated) — splitT1/splitT2 — so the label boundaries are the
    // identical longs in both engines.
    "q101_split_assign" ->
      raw"""WITH h AS (
  SELECT doc_id,
    ('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents),
s AS (
  SELECT doc_id, CASE WHEN hv < $splitT1 THEN 'train'
                      WHEN hv < $splitT2 THEN 'val'
                      ELSE 'test' END AS split
  FROM h)
SELECT split, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM s GROUP BY split ORDER BY split""",

    // C4 greedy sentence grouping (index_documents.py:110-129) as a
    // recursive CTE: fold over the per-doc sentence LIST by index (no unnest
    // ordering hazard), replicating the reference's counter exactly — the
    // phantom +1 on the first append (buf_len = len+1), reset to len after
    // an overflow flush, flush condition buf_len + len + 1 > 200. closed_len
    // accumulates finished chunks' joined lengths; cur_len tracks the open
    // buffer's joined length (sentences are pre-stripped, so the final
    // .strip() is a no-op and join-length arithmetic is exact).
    "q42_sentence_chunks" ->
      raw"""WITH RECURSIVE c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents),
lists AS (
  SELECT doc_id,
    list_filter(
      list_transform(
        regexp_extract_all(text, '[^.!?]*(?:[.!?]+[^.!?\s][^.!?]*)*[.!?]*'),
        s -> regexp_replace(s, '^\s+|\s+$$', '', 'g')),
      s -> length(s) > 0) AS lst
  FROM c WHERE length(text) > 0),
grouped AS (
  SELECT doc_id, lst, 1 AS idx, 1 AS n_chunks,
    length(lst[1]) + 1 AS buf_len, length(lst[1]) AS cur_len, 0 AS closed_len
  FROM lists WHERE len(lst) > 0
  UNION ALL
  SELECT doc_id, lst, idx + 1,
    CASE WHEN buf_len + length(lst[idx + 1]) + 1 > 200 THEN n_chunks + 1 ELSE n_chunks END,
    CASE WHEN buf_len + length(lst[idx + 1]) + 1 > 200 THEN length(lst[idx + 1])
         ELSE buf_len + length(lst[idx + 1]) + 1 END,
    CASE WHEN buf_len + length(lst[idx + 1]) + 1 > 200 THEN length(lst[idx + 1])
         ELSE cur_len + 1 + length(lst[idx + 1]) END,
    CASE WHEN buf_len + length(lst[idx + 1]) + 1 > 200 THEN closed_len + cur_len
         ELSE closed_len END
  FROM grouped WHERE idx < len(lst))
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
CAST(closed_len + cur_len AS BIGINT) AS sum_len
FROM grouped WHERE idx = len(lst)
ORDER BY doc_id""",

    "q59_sentence_split" ->
      raw"""WITH c AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      chr(160), ' ', 'g'), '[ \t]+', ' ', 'g'), '\n{3,}', chr(10) || chr(10), 'g'),
      '^\s+|\s+$$', '', 'g') AS text
  FROM documents),
nz AS (SELECT doc_id, text FROM c WHERE length(text) > 0),
segs AS (
  SELECT doc_id,
    unnest(list_filter(
      list_transform(
        regexp_extract_all(regexp_replace(text, '^\s+|\s+$$', '', 'g'),
          '[^.!?]*(?:[.!?]+[^.!?\s][^.!?]*)*[.!?]*'),
        s -> regexp_replace(s, '^\s+|\s+$$', '', 'g')),
      s -> length(s) > 0)) AS sent
  FROM nz)
SELECT doc_id, count(*) AS n_sents,
CAST(sum(length(sent)) AS BIGINT) AS sum_len,
CAST(max(length(sent)) AS INT) AS max_len
FROM segs GROUP BY doc_id ORDER BY doc_id""",

    // PII redaction chain: email -> IPv4 -> phone, all RE2-portable; the
    // planted input is rebuilt from doc_id so redaction replays exactly
    "q60_pii_redaction" ->
      raw"""WITH planted AS (
  SELECT doc_id,
    'contact user' || doc_id::VARCHAR || '@example.com before '
      || substring(text, 1, 120)
      || ' or call +1 (555) 01' || doc_id::VARCHAR
      || ' from 10.' || (doc_id % 256)::VARCHAR || '.0.1 thanks' AS pii_text
  FROM documents WHERE doc_id < 200),
red AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(pii_text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      '\+?[0-9][0-9()\-\. ]{5,}[0-9]', '<PHONE>', 'g') AS red
  FROM planted)
SELECT doc_id, CAST(length(red) AS INT) AS red_len,
substr(md5(red), 1, 16) AS red_fp,
CAST(len(string_split(red, '<EMAIL>')) - 1 AS INT) AS n_email,
CAST(len(string_split(red, '<PHONE>')) - 1 AS INT) AS n_phone,
CAST(len(string_split(red, '<IP>')) - 1 AS INT) AS n_ip
FROM red ORDER BY doc_id""",

    // content-addressed 25% sample: md5-60bit('v1' || key) < 0.25 * 2^60
    "q61_hash_sample" ->
      raw"""SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5('v1' || doc_id::VARCHAR), 1, 15))::BIGINT < 288230376151711744
ORDER BY doc_id""",

    // per-source token budget: partitioned running word-count sum <= 2000
    "q62_token_budget" ->
      raw"""WITH d AS (
  SELECT doc_id, source,
    CASE WHEN length(st) = 0 THEN 0 ELSE len(string_split_regex(st, '\s+')) END AS n_tok
  FROM (SELECT doc_id, source,
          regexp_replace(text, '^\s+|\s+$$', '', 'g') AS st FROM documents)),
r AS (
  SELECT doc_id, source, n_tok,
    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM d)
SELECT source, count(*) AS n_docs,
CAST(sum(n_tok) AS BIGINT) AS tokens_used, max(doc_id) AS last_doc
FROM r WHERE run <= 2000 GROUP BY source ORDER BY source""",

    // interval join compares epoch_us: the parquet ts is TIMESTAMP(NANOS)
    // in DuckDB but µs-truncated in Spark (Tables.events) — ns-precision
    // comparisons could flip at boundaries, µs-integer ones cannot
    "q63_interval_join" ->
      raw"""SELECT a.event_id AS l_id, b.event_id AS r_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) >= epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
ORDER BY l_id, r_id""",

    // exact quantiles (quantile_cont ≡ Spark percentile interpolation) and
    // stddev from exact decimal sums (built-in var/stddev aggregates are
    // combine-order-dependent — never oracle those directly)
    "q64_quantiles" ->
      raw"""WITH c AS (
  SELECT event_type, value,
    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(12,0)) AS cents
  FROM events),
a AS (
  SELECT event_type, count(*) AS n,
    floor(quantile_cont(value, 0.5) * 1000000) / 1000000 AS median,
    floor(quantile_cont(value, 0.9) * 1000000) / 1000000 AS p90,
    CAST(sum(cents) AS DECIMAL(38,0)) AS s1,
    CAST(sum(cents * cents) AS DECIMAL(38,0)) AS s2
  FROM c GROUP BY event_type)
SELECT event_type, n, median, p90,
floor(sqrt((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * (n - 1))) / 100 * 10000) / 10000 AS sd
FROM a ORDER BY event_type""",

    // forward as-of with tolerance: first purchase at-or-after each click
    // within 30 min; equal-time tie -> max value (the repo's deterministic
    // as-of tie rule). epoch_us on both sides (ns-truncation parity).
    "q65_asof_forward" ->
      raw"""SELECT a.event_id, a.user_id,
  (SELECT b.value FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
      AND epoch_us(b.ts) >= epoch_us(a.ts)
      AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
    ORDER BY epoch_us(b.ts), b.value DESC LIMIT 1) AS asof_value
FROM events a WHERE a.event_type = 'click'
ORDER BY a.event_id""",

    // Gopher/C4 repetition + rule filters: all ratios are int/int double
    // divisions (bit-portable); line strip is the ASCII regexp chain
    "q66_gopher_rules" ->
      raw"""WITH d AS (
  SELECT doc_id, text, $toks AS tk,
    list_filter(
      list_transform(string_split(text, chr(10)),
        l -> regexp_replace(l, '^\s+|\s+$$', '', 'g')),
      l -> length(l) > 0) AS ls
  FROM documents WHERE doc_id < 300),
m AS (
  SELECT doc_id,
    CAST(len(tk) AS INT) AS word_cnt,
    CASE WHEN len(tk) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) END AS mwl,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END AS dlr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE) / len(ls) END AS blr,
    CASE WHEN len(ls) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.$$'))) AS DOUBLE) / len(ls) END AS elr,
    len(list_intersect(tk, ['the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','be','this'])) AS stop_hits
  FROM d)
SELECT doc_id, word_cnt,
floor(mwl * 10000) / 10000 AS mwl,
floor(dlr * 10000) / 10000 AS dup_line_ratio,
floor(blr * 10000) / 10000 AS bullet_ratio,
floor(elr * 10000) / 10000 AS ellipsis_ratio,
CASE WHEN word_cnt >= 50 AND word_cnt <= 100000
      AND mwl >= 3.0 AND mwl <= 10.0
      AND dlr < 0.3 AND blr < 0.9 AND elr < 0.3
      AND stop_hits >= 2 THEN 1 ELSE 0 END AS passes
FROM m ORDER BY doc_id""",

    // the end-to-end drop: q48's pipeline + anti-join of losers (rep <> id)
    "q67_drop_neardups" ->
      raw"""WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substring(text, 1, 300) AS text FROM documents WHERE doc_id < 60),
tk AS (SELECT doc_id, text, $toks AS tk FROM docs),
sh0 AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                i -> array_to_string(tk[i:i+2], ' '))) END AS sh
  FROM tk),
shf AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 11),
      s -> list_min(list_transform(sh, x -> ('0x' || substr(md5(s::VARCHAR || '|' || x), 1, 15))::BIGINT))) AS sig
  FROM shf),
banded AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(0, 3),
      b -> concat_ws(',', b::VARCHAR || ':',
        array_to_string(list_transform(sig[b*3+1:b*3+3], v -> v::VARCHAR), ',')))) AS band
  FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id),
pairs AS (
  SELECT c.id1, c.id2
  FROM cand c JOIN shf x ON x.doc_id = c.id1 JOIN shf y ON y.doc_id = c.id2
  WHERE len(list_intersect(x.sh, y.sh)) / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.4),
edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
losers AS (
  SELECT id FROM (SELECT id, min(label) AS rep FROM reach GROUP BY id) WHERE rep <> id)
SELECT d.doc_id, CAST(length(d.text) AS INT) AS text_len
FROM docs d WHERE d.doc_id NOT IN (SELECT id FROM losers)
ORDER BY d.doc_id""",

    // stratified mixing: driver-computed LONG thresholds inlined (no
    // double->long cast semantics cross-engine)
    "q68_stratified_sample" ->
      raw"""SELECT source, count(*) AS n_kept, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents
WHERE ('0x' || substr(md5('mix1' || doc_id::VARCHAR), 1, 15))::BIGINT <
  CASE source WHEN 'src0' THEN 576460752303423488
              WHEN 'src1' THEN 115292150460684704
              ELSE 288230376151711744 END
GROUP BY source ORDER BY source""",

    // per-query top-k: rank by the bit-identical cosine, vec_id tiebreak
    "q69_topk_per_query" ->
      raw"""SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
floor(1000 * cos) AS cos_m
FROM (
  SELECT q.vec_id AS query_id, e.vec_id,
    list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cos,
    row_number() OVER (PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
               e.vec_id) AS rank
  FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q
  WHERE e.vec_id >= 3)
WHERE rank <= 3 ORDER BY query_id, rank""",

    // sliding 1h/15m windows: each event belongs to 4 epoch-aligned windows
    "q70_sliding_windows" ->
      raw"""WITH e AS (SELECT epoch_us(ts) AS us FROM events),
w AS (
  SELECT (us // 900000000 - k) * 900000000 AS start_us
  FROM e, (SELECT unnest(generate_series(0, 3)) AS k) ks)
SELECT CAST(start_us // 1000 AS BIGINT) AS start_ms,
CAST((start_us + 3600000000) // 1000 AS BIGINT) AS end_ms,
count(*) AS n
FROM w GROUP BY 1, 2 ORDER BY start_ms""",

    // benchmark-contamination 8-gram overlap: docs 0-4 are the benchmark;
    // per doc, the fraction of its distinct 8-grams present in the set
    "q71_contamination" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 300),
g AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 8 THEN []
         ELSE list_distinct(list_transform(generate_series(1, len(tk) - 7),
                i -> array_to_string(tk[i:i+7], ' '))) END AS grams
  FROM tk),
bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 5),
ov AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g) dg
  JOIN bench USING (gram)
  GROUP BY doc_id)
SELECT g.doc_id, CAST(len(grams) AS INT) AS n_grams,
CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
CASE WHEN len(grams) = 0 THEN 0.0
     ELSE floor(1000 * coalesce(ov.n_overlap, 0) / len(grams)) / 1 END AS score_m
FROM g LEFT JOIN ov USING (doc_id) ORDER BY g.doc_id""",

    // BM25 (Robertson idf, k1=1.2 b=0.75) for query terms data/model/search;
    // per-doc sum through DECIMAL(24,12) = combine-order independent, then
    // floor-3dp (as thousandths) absorbing cross-engine ln() ulps
    "q72_bm25" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)::DOUBLE) AS avgdl FROM tk),
hits AS (
  SELECT doc_id, len(tk) AS dl, t.term, count(*)::DOUBLE AS tf
  FROM tk, unnest(tk) AS t(term)
  WHERE t.term IN ('data', 'model', 'search')
  GROUP BY doc_id, len(tk), t.term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term)
SELECT doc_id,
floor(1000 * CAST(sum(CAST(
  ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
    * (h.tf * 2.2) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))
  AS DECIMAL(24,12))) AS DOUBLE)) / 1 AS score_m
FROM hits h JOIN dfreq d USING (term), stats s
GROUP BY doc_id ORDER BY doc_id""",

    // greedy first-fit sequence packing per shard: recursive CTE folds over
    // each shard's id-ordered (id, n_tokens) list carrying the pack state;
    // a doc opens a new pack iff the current pack is non-empty and would
    // overflow 1000 tokens (over-long docs get their own pack)
    "q73_pack_sequences" ->
      raw"""WITH RECURSIVE t AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard, CAST(len($toks) AS BIGINT) AS n
  FROM documents WHERE doc_id < 400),
lists AS (
  SELECT shard, list(struct_pack(id := doc_id, n := n) ORDER BY doc_id) AS lst
  FROM t GROUP BY shard),
f AS (
  SELECT shard, lst, 1 AS idx,
    CAST(0 AS BIGINT) AS pack, 0 AS pos, CAST(0 AS BIGINT) AS before_t
  FROM lists WHERE len(lst) > 0
  UNION ALL
  SELECT shard, lst, idx + 1,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN pack + 1 ELSE pack END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN 0 ELSE pos + 1 END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN CAST(0 AS BIGINT)
         ELSE before_t + lst[idx].n END
  FROM f WHERE idx < len(lst))
SELECT lst[idx].id AS doc_id, shard, pack AS pack_id, pos AS pack_pos,
before_t AS pack_tokens_before
FROM f ORDER BY doc_id""",

    // materialized packs: the q73 recursion's assignments joined back to
    // text, one row per pack, texts concatenated in pack order with \n\n;
    // md5 of the packed text = byte-exact cross-engine check
    "q76_materialize_packs" ->
      raw"""WITH RECURSIVE t AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard, CAST(len($toks) AS BIGINT) AS n, text
  FROM documents WHERE doc_id < 200),
lists AS (
  SELECT shard, list(struct_pack(id := doc_id, n := n) ORDER BY doc_id) AS lst
  FROM t GROUP BY shard),
f AS (
  SELECT shard, lst, 1 AS idx,
    CAST(0 AS BIGINT) AS pack, 0 AS pos, CAST(0 AS BIGINT) AS before_t
  FROM lists WHERE len(lst) > 0
  UNION ALL
  SELECT shard, lst, idx + 1,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN pack + 1 ELSE pack END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN 0 ELSE pos + 1 END,
    CASE WHEN before_t + lst[idx].n + lst[idx + 1].n > 1000 THEN CAST(0 AS BIGINT)
         ELSE before_t + lst[idx].n END
  FROM f WHERE idx < len(lst)),
asg AS (SELECT lst[idx].id AS doc_id, shard, pack AS pack_id, pos FROM f)
SELECT a.shard, a.pack_id, count(*) AS n_docs,
substr(md5(string_agg(t.text, chr(10) || chr(10) ORDER BY a.pos)), 1, 16) AS text_h
FROM asg a JOIN t USING (doc_id)
GROUP BY a.shard, a.pack_id ORDER BY a.shard, a.pack_id""",

    // char-trigram LM quality scoring: model = P(c3|c1c2) from exact counts
    // over docs >= 100; score docs < 100 by mean trigram ln-prob (unseen ->
    // the exact double literal, never a computed ln), decimal-summed
    "q77_lm_quality" ->
      raw"""WITH ref AS (SELECT text AS t FROM documents WHERE doc_id >= 100),
rt AS (
  SELECT unnest(list_transform(generate_series(1, length(t) - 2), i -> lower(substr(t, i, 3)))) AS tri
  FROM ref WHERE length(t) >= 3),
m0 AS (SELECT tri, count(*) AS n_tri FROM rt GROUP BY tri),
m AS (
  SELECT tri,
    ln(n_tri::DOUBLE / sum(n_tri) OVER (PARTITION BY substr(tri, 1, 2))) AS logp
  FROM m0),
d AS (SELECT doc_id, text AS t FROM documents WHERE doc_id < 100),
dt AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, length(t) - 2), i -> lower(substr(t, i, 3)))) AS tri
  FROM d WHERE length(t) >= 3)
SELECT doc_id, count(*) AS n_tri,
floor(1000 * (CAST(sum(CAST(coalesce(m.logp, -23.025850929940457) AS DECIMAL(24,12))) AS DOUBLE) / count(*))) / 1 AS lp_m
FROM dt LEFT JOIN m USING (tri)
GROUP BY doc_id ORDER BY doc_id""",

    // hybrid retrieval: BM25 top-20 + cosine top-20 fused by reciprocal
    // rank (K=60). Both ranks sort FLOORED scores with id tiebreaks, so the
    // rank assignments (and the exact double 1/(60+r) sums) are
    // engine-deterministic
    "q74_hybrid_fusion" ->
      raw"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)::DOUBLE) AS avgdl FROM tk),
hits AS (
  SELECT doc_id, len(tk) AS dl, t.term, count(*)::DOUBLE AS tf
  FROM tk, unnest(tk) AS t(term)
  WHERE t.term IN ('data', 'model', 'search')
  GROUP BY doc_id, len(tk), t.term),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term),
bm AS (
  SELECT doc_id AS id,
    floor(1000 * CAST(sum(CAST(
      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
        * (h.tf * 2.2) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))
      AS DECIMAL(24,12))) AS DOUBLE)) / 1 AS score_m
  FROM hits h JOIN dfreq d USING (term), stats s
  GROUP BY doc_id),
bmr AS (
  SELECT id, row_number() OVER (ORDER BY score_m DESC, id) AS rank_a
  FROM bm QUALIFY rank_a <= 20),
cos AS (
  SELECT e.vec_id AS id,
    floor(1000 * list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[])) / 1 AS cos_m
  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id <> 0),
cosr AS (
  SELECT id, row_number() OVER (ORDER BY cos_m DESC, id) AS rank_b
  FROM cos QUALIFY rank_b <= 20)
SELECT coalesce(bmr.id, cosr.id) AS id,
floor(1000000 * (coalesce(1.0 / (60 + rank_a), 0.0) + coalesce(1.0 / (60 + rank_b), 0.0))) / 1 AS rrf_u,
CAST(rank_a AS BIGINT) AS rank_a, CAST(rank_b AS BIGINT) AS rank_b
FROM bmr FULL JOIN cosr ON bmr.id = cosr.id
ORDER BY rrf_u DESC, id""",

    // int8-quantized cosine: scale = max|v|/127, code = floor(v/s + 0.5);
    // scales cancel in cosine, so the similarity is integer dot / integer
    // norms. Codes as integer-valued DOUBLEs stay EXACT in list_inner_product
    // (≤ 127²·dim ≪ 2^53), so the only float op is the final sqrt/divide
    "q75_quantized_cosine" ->
      raw"""WITH sc AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS s
  FROM embeddings),
c AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> 0.0)
         ELSE list_transform(embedding, x -> floor(x::DOUBLE / s + 0.5)) END AS codes
  FROM sc),
q AS (SELECT codes AS qc FROM c WHERE vec_id = 0)
SELECT c.vec_id,
CASE WHEN list_inner_product(c.codes, c.codes) = 0
       OR list_inner_product(q.qc, q.qc) = 0 THEN 0.0
     ELSE floor(1000 * list_inner_product(c.codes, q.qc)
            / (sqrt(list_inner_product(c.codes, c.codes))
               * sqrt(list_inner_product(q.qc, q.qc)))) / 1 END AS cos8_m
FROM c, q WHERE c.vec_id <> 0 ORDER BY c.vec_id""",

    // URL/domain hygiene: planted URLs (q60's pattern), domain = host
    // lower-cased www-stripped, blocked = exact or subdomain-suffix match
    "q78_url_filter" ->
      raw"""WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'not a url'
         ELSE 'https://' ||
           (['spamfarm.example','news.goodsite.example','www.mirror.example',
             'ads.example','docs.example','tracker.ads.example','blog.example'])[(doc_id % 7 + 1)::INT]
           || '/p/' || doc_id::VARCHAR END AS url
  FROM documents WHERE doc_id < 300),
d AS (
  SELECT doc_id,
    regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)), '^www\.', '') AS domain
  FROM u)
SELECT doc_id, domain,
len(list_filter(['spamfarm.example', 'ads.example'],
  b -> domain = b OR ends_with(domain, '.' || b))) > 0 AS blocked
FROM d ORDER BY doc_id""",

    // token-share rebalancing: thresholds from exact BIGINT token sums with
    // the same IEEE double ops (m*share/tokens, least 1.0, floor*2^60) and
    // the same salted content hash as the Spark driver computes
    "q79_rebalance" ->
      raw"""WITH t AS (
  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n FROM documents),
g AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tg FROM t GROUP BY lang),
tgt AS (SELECT * FROM (VALUES ('de', 0.3), ('en', 0.5), ('fr', 0.2)) s(lang, share)),
m AS (
  SELECT min(g.tg::DOUBLE / tgt.share) AS m
  FROM g JOIN tgt USING (lang) WHERE g.tg > 0),
th AS (
  SELECT g.lang,
    CAST(floor(least(1.0, m.m * tgt.share / g.tg::DOUBLE) * 1152921504606846976) AS BIGINT) AS thr
  FROM g JOIN tgt USING (lang), m WHERE g.tg > 0),
kept AS (
  SELECT t.lang, t.n FROM t JOIN th USING (lang)
  WHERE ('0x' || substr(md5('mix1' || t.doc_id::VARCHAR), 1, 15))::BIGINT < th.thr)
SELECT lang, count(*) AS n_kept, CAST(sum(n) AS BIGINT) AS tokens_kept
FROM kept GROUP BY lang ORDER BY lang""",

    // HTML -> text: identical planted markup, identical RE2 strip chain
    // (blocks, comments, tags, entities, whitespace collapse, edge trim)
    "q80_html_extract" ->
      raw"""WITH h AS (
  SELECT doc_id,
    '<html><head><title>t</title></head><body>'
    || '<script>var x = 1 < 2;</script><style>p { color: red; }</style>'
    || '<!-- hidden --><h1>Doc &amp; ' || doc_id::VARCHAR
    || '</h1><p class="main">' || substring(text, 1, 200)
    || '</p><div>&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</div></body></html>' AS html
  FROM documents WHERE doc_id < 300),
e AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(html,
        '(?is)<(script|style|head)\b[^>]*>.*?</(script|style|head)>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '(?s)<[^>]*>', ' ', 'g'),
        '&nbsp;', ' ', 'g'),
        '&amp;', '&', 'g'),
        '&lt;', '<', 'g'),
        '&gt;', '>', 'g'),
        '&quot;', '"', 'g'),
        '&#39;', '''', 'g'),
        '\s+', ' ', 'g'),
        '^ | $$', '', 'g') AS extracted
  FROM h)
SELECT doc_id, CAST(length(extracted) AS INT) AS n_chars,
substr(md5(extracted), 1, 16) AS text_h
FROM e ORDER BY doc_id""",
  )

  /** The driver contract. Catalog-lifecycle probes share their direct
    * twin's SQL BY REFERENCE (not a copied literal, so the spellings
    * cannot drift): q162 answers the q148 query through a staged →
    * updated → compacted → REFRESHED → vacuumed generation catalog, and
    * its defined semantics are exactly the refreshed index q158 already
    * replays relationally — DuckDB never sees staging, pointers,
    * compaction or vacuum.
    */
  val all: Map[String, String] = base +
    ("q162_catalog_lifecycle" -> base("q158_ivfpq_refresh")) +
    ("q163_text_policy_lifecycle" -> base("q97_bm25_from_index")) +
    // the maintenance-policy trio's remaining two axes (round 16): the
    // DRIFT policy's refresh is exactly the retrain q158 replays, and
    // the PATCH-HISTORY policy's compaction is latest-wins-invariant
    // over q154's weights — the policies, catalogs and thresholds are
    // engine mechanics DuckDB never sees
    ("q164_vector_policy_lifecycle" -> base("q158_ivfpq_refresh")) +
    ("q165_weights_policy_lifecycle" -> base("q154_soft_dedup_weights")) +
    // the fourth and fifth store axes (round 16): the sketch policy's
    // merge is estimate-invariant and the exact recount is
    // sketch-independent (q120's own discipline), and the sequence
    // policy's pairs compaction is content-parity by contract (q128's
    // planted construction) — sketches, epochs, catalogs and policies
    // are engine mechanics DuckDB never sees
    ("q166_sketch_policy_lifecycle" -> base("q120_compacted_hh")) +
    ("q167_sequence_policy_lifecycle" ->
      base("q128_incremental_sequence_dedup")) +
    // the operational closes (round 17): q168 sweeps BOTH catalogs with
    // maintainAll and answers through the sequence pairs store (q128's
    // planted construction — the sketch leg is require-pinned in the
    // probe); q169 drives refusal → vacuum → re-tick → publish on the
    // same catalog, and the injected mid-compaction fold pairs with
    // nothing by construction, so the pairs answer is unchanged —
    // sweeps, refusals and vacuum are engine mechanics DuckDB never sees
    ("q168_maintain_all_sweep" -> base("q128_incremental_sequence_dedup")) +
    ("q169_vacuum_under_policy" -> base("q128_incremental_sequence_dedup"))
}
