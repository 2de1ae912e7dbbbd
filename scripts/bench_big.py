#!/usr/bin/env python
"""DuckDB side of the data-dominating benches.

Usage: python scripts/bench_big.py <bigDir> <oracle_sql.json> [reps] [names]

`names` is a comma-separated query list, or the keywords `headline`
(default: the 7 classic benches) / `llm` (the dedup/ANN/text suite).
Runs each query's oracle SQL over the MakeBigData layout with the same
engine-side reducer as graft.BenchBig (`SELECT sum(hash(t)) FROM
(<sql>) t` — forces full output computation, returns one row, so client
transfer is never timed). 32 threads, warm run + best of reps.

Two queries get BENCH-ONLY SQL overrides (the gate oracle stays the
semantic definition): dedup_simhash's gate oracle expands tokens x60
via CROSS JOIN range(60) (fine at gate scale, needlessly quadratic-ish
at 50-200x), replaced by one group-by with 60 conditional sums;
dedup_simhash_pairs_full's gate oracle is the brute-force O(n^2)
hamming definition (exact-recall spec), replaced by the same banded
pigeonhole algorithm the engine runs — identical output, feasible plan.

Dev-only tool (driver-side python env); not part of the library.
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
HEADLINE = [
    "scan_full_width", "q1_pricing_summary", "q1_pricing_summary_cents",
    "join_orders_customer", "metric_gauc", "metric_gauc_sorted",
    "dedup_block_roundtrip",
]
REL = [
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_nation_margin", "q10_returned_items", "q12_priority_class",
    "q13_customer_distribution", "q14_promo_share", "q15_top_supplier",
    "q17_small_quantity", "q18_large_volume", "q19_discounted_revenue",
    "q21_waiting_supplier", "q22_global_sales",
]
LLM = [
    "dedup_exact_groups", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_cluster_components", "dedup_incremental_pairs",
    "dedup_simhash", "dedup_simhash_pairs_full", "dedup_embedding_neardup",
    "dedup_embedding_neardup_wide",
    "ann_topk_brute", "ann_topk_bucketed", "ann_topk_ivf", "ann_topk_int8",
    "text_stats", "text_quality", "text_langid", "text_fingerprint",
    "text_tfidf_topk", "text_quality_filter", "text_repetition", "text_lm_score",
    "text_chunk_overlap", "text_redact_pii", "text_vocab_topn",
    "pack_sequences", "sample_mixture",
    "dedup_span_coverage", "dedup_span_removal", "text_bm25_topk",
    "hybrid_rrf_fusion", "encode_categorical", "ordinal_stable_ids",
    "web_url_normalize", "web_host_cap", "embedding_gram_matrix",
    "sample_negatives", "ann_hard_negatives",
    "dedup_line_level", "graph_pagerank", "sketch_kmv_per_group", "agg_grid_quantiles",
    "input_layer_assemble", "sample_dsir_topn", "sketch_kmv_overlap",
    "ann_topk_pq", "pq_codebooks", "classifier_train_lr", "classifier_lr_confusion",
]

# SINGLE-SOURCE WARNING: these constants mirror the Scala side
# (TextFunctions.P, PolyHash mults 31/131, the <<30 two-family packing,
# NearDup.SimHashBits=60, and simHashNearDups' maxHamming=2 -> 3 bands
# of 20 bits). They are duplicated here because this dev script cannot
# import Scala; if any of those change, update these overrides or the
# DuckDB side silently benches a different query than the engine runs.
P = 1000000007


def polyhash(e, mult=31):
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(list_filter(string_to_array({e},''), c -> len(c) > 0),"
        " c -> CAST(ascii(c) AS BIGINT))),"
        f" (a,c) -> (a*{mult}+c) % {P})"
    )


def simhash_fp_cte():
    """(doc_id, simhash) via ONE group-by with 60 conditional sums."""
    sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS w{b}"
        for b in range(60))
    bits = " + ".join(
        f"(CASE WHEN w{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(60))
    return f"""tokh AS (SELECT doc_id, {polyhash('t')} + ({polyhash('t', 131)} << 30) AS h
  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents)),
agg AS (SELECT doc_id, {sums} FROM tokh GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg)"""


def simhash_pairs_banded():
    """Banded pigeonhole candidates (the engine's algorithm): 60 bits in
    3 bands of 20; any pair with hamming <= 2 shares one exact band."""
    bands = "\n    UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, (simhash >> {j * 20}) & {(1 << 20) - 1} AS bv FROM fp"
        for j in range(3))
    return f"""WITH {simhash_fp_cte()},
bands AS ({bands}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 2"""


# dedup_span_removal's gate oracle rebuilds kept text via a token-level
# NOT EXISTS + 200M-row ordered string_agg — the brute-force semantic
# definition, which OOMs DuckDB at bench scale. The override rebuilds
# each doc ROW-LOCALLY from its sorted interval list (slice the gaps
# between intervals, join) — the same algorithm the engine's excise
# kernel runs, identical output.
SPAN_REMOVAL_BIG = """
WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)-3),
    i -> struct_pack(pos := i,
      h := {ph}))) AS ph
  FROM tok WHERE len(toks) >= 5),
e AS (SELECT doc_id, ph.pos AS pos, ph.h AS h FROM g),
dup AS (SELECT h, min(doc_id) AS mn FROM e GROUP BY h
  HAVING min(doc_id) <> max(doc_id)),
rem AS (SELECT e.doc_id, e.pos FROM e JOIN dup USING (h) WHERE e.doc_id <> dup.mn),
isl AS (SELECT doc_id, pos, max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pend FROM rem),
isl2 AS (SELECT doc_id, pos, sum(CASE WHEN pend IS NULL OR pos > pend THEN 1 ELSE 0 END)
    OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM isl),
iv AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 5 AS e FROM isl2 GROUP BY doc_id, grp),
ivl AS (SELECT doc_id, list(struct_pack(s := s, e := e) ORDER BY s) AS ivs
  FROM iv GROUP BY doc_id),
built AS (SELECT tok.doc_id, CASE WHEN v.ivs IS NULL THEN array_to_string(toks, ' ')
  ELSE array_to_string(flatten(list_transform(range(0, len(v.ivs)+1),
    k -> toks[(CASE WHEN k = 0 THEN 1 ELSE v.ivs[k].e END)
            : (CASE WHEN k = len(v.ivs) THEN len(toks) ELSE v.ivs[k+1].s - 1 END)])),
    ' ') END AS ct
  FROM tok LEFT JOIN ivl v USING (doc_id))
SELECT doc_id, coalesce(ct, '') AS clean_text FROM built
""".format(ph=(
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(list_filter(string_to_array(array_to_string(toks[i:i+4], ' '),''),"
    " c -> len(c) > 0), c -> CAST(ascii(c) AS BIGINT))),"
    f" (a,c) -> (a*31+c) % {P})"))

BIG_SQL_OVERRIDES = {
    "dedup_simhash": f"WITH {simhash_fp_cte()}\nSELECT doc_id, simhash FROM fp",
    "dedup_simhash_pairs_full": simhash_pairs_banded(),
    "dedup_span_removal": SPAN_REMOVAL_BIG,
}

# dedup_line_level's gate oracle reads the exploded (doc, pos, line,
# hash) relation from TWO CTE consumers; DuckDB re-evaluates
# non-materialized CTEs per reference, and the duplicated 15M-line
# char-hash explosion spilled the disk away (>75 GB) at x200. An honest
# DuckDB user materializes the line relation once; the bench times
# setup + query together (the Spark side computes the same relation
# once inside one plan).
LL_SETUP = """CREATE OR REPLACE TEMP TABLE ll AS
WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
l0 AS (SELECT doc_id, toks,
    unnest(range(0, CAST(ceil(len(toks)/10.0) AS BIGINT))) AS pos FROM t),
l AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
    array_to_string(list_slice(toks, pos*10+1, pos*10+10), ' ') AS line FROM l0)
SELECT doc_id, pos, line, {ph} AS h FROM l""".format(ph=polyhash("line"))
LL_QUERY = """WITH b AS (SELECT doc_id,
    CAST(ceil(len(string_split(text,' '))/10.0) AS BIGINT) AS n_lines FROM documents),
m AS (SELECT h, min(doc_id) AS mn, max(doc_id) AS mx FROM ll GROUP BY h),
k AS (SELECT ll.doc_id, ll.pos, ll.line FROM ll JOIN m USING (h)
  WHERE m.mn = m.mx OR ll.doc_id = m.mn),
r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
    CAST(count(*) AS BIGINT) AS n_kept FROM k GROUP BY doc_id)
SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text, b.n_lines,
  coalesce(r.n_kept, CAST(0 AS BIGINT)) AS n_kept
FROM b LEFT JOIN r USING (doc_id)"""


# graph_pagerank's gate oracle reads the co-occurrence edge CTE (a
# 360M-row self-join + DISTINCT at x200) from FIVE consumers (deg, r0,
# three iteration sums) -> re-evaluation spills unboundedly. Materialize
# the edge list once, then run the unrolled sweeps over it — identical
# integer arithmetic (mirrors OracleFragments.pageRankCtes).
def pr_ctes(iters, damp=850000000):
    teleport = 1000000000 - damp
    parts = [
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT src AS id, CAST(1000000000 AS BIGINT) AS pr FROM deg)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""s{i} AS (SELECT e.dst AS id, SUM(r.pr // d.deg) AS s
  FROM e JOIN r{i - 1} r ON r.id = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst),
r{i} AS (SELECT id, {teleport} + (s // 1000000000) * {damp}
  + ((s % 1000000000) * {damp}) // 1000000000 AS pr FROM s{i})""")
    return ",\n".join(parts)


PR_SETUP = """CREATE OR REPLACE TEMP TABLE e AS
WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem)
SELECT DISTINCT a.it AS src, b.it AS dst
FROM li a JOIN li b ON a.bk = b.bk AND a.it <> b.it"""
PR_QUERY = f"WITH {pr_ctes(3)}\nSELECT id AS part_id, pr AS rank_nano FROM r3"

# The PQ / classifier gate oracles unroll iterative training as nested
# CTEs (fine at gate scale); DuckDB's CTE re-evaluation makes the
# unrolled chain ~2^iters at corpus scale. An honest DuckDB user
# materializes each training step once — same arithmetic, each step
# executed exactly once, setup + query timed together (the Spark side
# likewise re-trains inside the timed gate).
def _sqd(a, b):
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip({a}, {b}), z -> (z[1]-z[2])*(z[1]-z[2]))), (p,x) -> p+x)")


def pq_setups(m=4, ksub=4, iters=2, dsub=16):
    stmts = [f"""CREATE OR REPLACE TEMP TABLE pq_sq AS
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
iq AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x * 1000.0) AS BIGINT)) AS q FROM e)
SELECT vec_id, CAST(s.sub AS BIGINT) AS sub,
  list_slice(q, s.sub*{dsub}+1, (s.sub+1)*{dsub}) AS sv
FROM iq CROSS JOIN range({m}) s(sub)""",
             f"""CREATE OR REPLACE TEMP TABLE pq_c0 AS
SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id)-1 AS BIGINT) AS cid,
  sv AS cent FROM pq_sq QUALIFY cid < {ksub}"""]
    for i in range(1, iters + 1):
        stmts.append(f"""CREATE OR REPLACE TEMP TABLE pq_a{i} AS
SELECT sub, vec_id, sv, cid FROM (
  SELECT t.sub, t.vec_id, t.sv, c.cid,
    row_number() OVER (PARTITION BY t.sub, t.vec_id
      ORDER BY {_sqd('t.sv', 'c.cent')}, c.cid) AS rn
  FROM pq_sq t JOIN pq_c{i-1} c ON c.sub = t.sub) WHERE rn = 1""")
        stmts.append(f"""CREATE OR REPLACE TEMP TABLE pq_c{i} AS
SELECT o.sub, o.cid, COALESCE(n.cent, o.cent) AS cent
FROM pq_c{i-1} o LEFT JOIN (
  SELECT sub, cid, list(elem ORDER BY pos) AS cent FROM (
    SELECT sub, cid, pos, CAST(floor(CAST(SUM(x) AS DOUBLE)/COUNT(*)) AS BIGINT) AS elem
    FROM (SELECT sub, cid, unnest(sv) AS x, unnest(range(len(sv))) AS pos FROM pq_a{i})
    GROUP BY sub, cid, pos) GROUP BY sub, cid) n
ON n.sub = o.sub AND n.cid = o.cid""")
    stmts.append(f"""CREATE OR REPLACE TEMP TABLE pq_codes AS
SELECT vec_id, sub, cid FROM (
  SELECT t.vec_id, t.sub, c.cid,
    row_number() OVER (PARTITION BY t.vec_id, t.sub
      ORDER BY {_sqd('t.sv', 'c.cent')}, c.cid) AS rn
  FROM pq_sq t JOIN pq_c{iters} c ON c.sub = t.sub) WHERE rn = 1""")
    return stmts


# final-table names derive from the SAME iters value as the setup chain:
# a hardcoded pq_c2/lr_w3 would silently read a stale penultimate table
# if iters ever changed (CREATE OR REPLACE keeps earlier tables alive)
def pq_codebooks_query(iters=2):
    return f"""WITH occ AS (
  SELECT sub, cid, CAST(COUNT(*) AS BIGINT) AS n FROM pq_codes GROUP BY sub, cid)
SELECT c.sub, c.cid AS cluster_id, CAST(COALESCE(occ.n, 0) AS BIGINT) AS n_vectors,
  array_to_string(c.cent, ',') AS centroid
FROM pq_c{iters} c LEFT JOIN occ ON occ.sub = c.sub AND occ.cid = c.cid"""


def pq_topk_query(iters=2):
    return f"""WITH lut AS (
  SELECT q.vec_id AS q_id, c.sub, c.cid, {_sqd('q.sv', 'c.cent')} AS d
  FROM pq_sq q JOIN pq_c{iters} c ON c.sub = q.sub WHERE q.vec_id < 16),
pr AS (SELECT l.q_id, p.vec_id AS n_id, CAST(SUM(l.d) AS BIGINT) AS adist
  FROM pq_codes p JOIN lut l ON l.sub = p.sub AND l.cid = p.cid AND p.vec_id != l.q_id
  GROUP BY l.q_id, p.vec_id)
SELECT q_id, n_id, adist,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS BIGINT) AS rn
FROM pr QUALIFY rn <= 5"""


def lr_setups(d=65, iters=3, lr_milli=4000):
    stmts = ["""CREATE OR REPLACE TEMP TABLE lr_fx AS
SELECT vec_id,
  list_append(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)),
    CAST(1000 AS BIGINT)) AS x,
  CASE WHEN label < 5 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
FROM embeddings""",
             """CREATE OR REPLACE TEMP TABLE lr_xj AS
SELECT vec_id, y, CAST(pos AS BIGINT) AS j, xv FROM
  (SELECT vec_id, y, unnest(x) AS xv, unnest(range(len(x))) AS pos FROM lr_fx)""",
             "CREATE OR REPLACE TEMP TABLE lr_n AS SELECT CAST(count(*) AS BIGINT) AS n FROM lr_fx",
             f"CREATE OR REPLACE TEMP TABLE lr_w0 AS SELECT CAST(r.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w FROM range({d}) r(j)"]
    for i in range(1, iters + 1):
        stmts.append(f"""CREATE OR REPLACE TEMP TABLE lr_w{i} AS
WITH z AS (SELECT xj.vec_id, xj.y, CAST(SUM(xj.xv * w.w) AS BIGINT) // 1000 AS zn
  FROM lr_xj xj JOIN lr_w{i-1} w ON w.j = xj.j GROUP BY xj.vec_id, xj.y),
e AS (SELECT vec_id, (GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000000000 AS BIGINT),
    500000000 + zn // 4)) - y*1000000000) // 1000 AS em FROM z),
g AS (SELECT xj.j, CAST(SUM(e.em * xj.xv) AS BIGINT) AS g
  FROM lr_xj xj JOIN e ON e.vec_id = xj.vec_id GROUP BY xj.j)
SELECT w.j, w.w - ({lr_milli} * (g.g // (SELECT n FROM lr_n))) // 1000 AS w
FROM lr_w{i-1} w JOIN g ON g.j = w.j""")
    return stmts


def lr_train_query(iters=3):
    return f"SELECT j, w AS w_nano FROM lr_w{iters}"


def lr_confusion_query(iters=3):
    return f"""WITH zf AS (
  SELECT xj.vec_id, xj.y, CAST(SUM(xj.xv * w.w) AS BIGINT) // 1000 AS zn
  FROM lr_xj xj JOIN lr_w{iters} w ON w.j = xj.j GROUP BY xj.vec_id, xj.y)
SELECT y, CASE WHEN GREATEST(CAST(0 AS BIGINT), LEAST(CAST(1000000000 AS BIGINT),
    500000000 + zn // 4)) >= 500000000
  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pred,
  CAST(count(*) AS BIGINT) AS n
FROM zf GROUP BY y, pred"""


PQ_ITERS = 2
LR_ITERS = 3

# name -> (setup stmt or [stmts], query): timed together like the CC closure
SETUP_OVERRIDES = {
    "dedup_line_level": (LL_SETUP, LL_QUERY),
    "graph_pagerank": (PR_SETUP, PR_QUERY),
    "pq_codebooks": (pq_setups(iters=PQ_ITERS), pq_codebooks_query(PQ_ITERS)),
    "ann_topk_pq": (pq_setups(iters=PQ_ITERS), pq_topk_query(PQ_ITERS)),
    "classifier_train_lr": (lr_setups(iters=LR_ITERS), lr_train_query(LR_ITERS)),
    "classifier_lr_confusion": (lr_setups(iters=LR_ITERS), lr_confusion_query(LR_ITERS)),
}

# dedup_cluster_components' gate oracle nests the full MinHash pair
# pipeline inside a recursive CTE; DuckDB re-evaluates non-materialized
# CTEs referenced from the recursive member EVERY iteration (~4x the
# whole pair detection). An honest DuckDB user materializes the pair set
# first, so the bench times a setup statement + the closure together
# (same total work the Spark side times in one query).
CC_SETUP = "CREATE OR REPLACE TEMP TABLE pairs AS\n{pairs_sql}"
CC_CLOSURE = """WITH RECURSIVE
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT id, component FROM comp"""


def main():
    big_dir, oracle_path = sys.argv[1:3]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names_arg = sys.argv[4] if len(sys.argv) > 4 else "headline"
    names = {"headline": HEADLINE, "llm": LLM, "rel": REL}.get(
        names_arg, names_arg.split(","))
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(big_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    rep_detail = {}
    for name in names:
        if name == "dedup_cluster_components":
            setup = CC_SETUP.format(pairs_sql=oracle["dedup_minhash_lsh"])
            wrapped = f"SELECT sum(hash(t)::DOUBLE) FROM ({CC_CLOSURE}) t"
            con.execute(setup)
            con.sql(wrapped).fetchall()  # warm
            ts = [timed_multi(con, [setup, wrapped]) for _ in range(reps)]
        elif name in SETUP_OVERRIDES:
            setup, q = SETUP_OVERRIDES[name]
            setups = setup if isinstance(setup, list) else [setup]
            wrapped = f"SELECT sum(hash(t)::DOUBLE) FROM ({q}) t"
            for s in setups:
                con.execute(s)
            con.sql(wrapped).fetchall()  # warm
            ts = [timed_multi(con, setups + [wrapped]) for _ in range(reps)]
        else:
            sql = BIG_SQL_OVERRIDES[name] if name in BIG_SQL_OVERRIDES else oracle[name]
            wrapped = f"SELECT sum(hash(t)::DOUBLE) FROM ({sql}) t"
            con.sql(wrapped).fetchall()  # warm
            ts = [timed(con, wrapped) for _ in range(reps)]
        out[name] = round(min(ts), 3)
        rep_detail[name] = [round(t, 3) for t in ts]
        print(f"[duck] {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"queries": out, "sf": big_dir}))
    print(json.dumps({"reps": rep_detail}), file=sys.stderr)


def timed(con, sql):
    t0 = time.time()
    con.sql(sql).fetchall()
    return time.time() - t0


def timed_multi(con, stmts):
    t0 = time.time()
    for s in stmts[:-1]:
        con.execute(s)
    con.sql(stmts[-1]).fetchall()
    return time.time() - t0


if __name__ == "__main__":
    main()
