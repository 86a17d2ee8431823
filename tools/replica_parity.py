#!/usr/bin/env python3
"""Replica-slice correctness gate at sf1 (round-13 verdict item #1).

The 7 most expensive queries have DuckDB oracles that are intractable at
sf1 (all-pairs / recursive-closure shapes); this gate turns "engine
completed at sf1" into "engine CORRECT at sf1" with zero quadratic oracle
cost, by exploiting graft.ScaleUp's disjoint-universe construction:

  - replica 0 is the sf0.1 data VERBATIM (identity key remap, unsalted
    text, unperturbed embeddings), so pair-local measures restricted to
    replica-0-internal pairs must equal the sf0.1 answer exactly;
  - the per-replica text salt appends ONE token, so a doc and its salted
    twin share all base shingles: jac(twin) = n/(n+1) >= 0.5 whenever the
    doc has >= 1 shingle (>= 3 tokens) -- every cross-replica twin edge
    exists, gluing each base near-dup cluster's 10 copies into ONE family
    with cluster_id = the replica-0 min and n_cluster = 10x the base;
  - new edges BETWEEN different base clusters could only appear if the
    salt/perturbation pushed a below-threshold pair across the threshold
    ("promotion"); the gate PROVES none exist for this dataset:
      jaccard: adding the shared salt token moves jac from I/U to
        (I+1)/(U+1) (both-salted, same replica) -- crosses 0.5 only when
        U = 2I+1 AND both docs end with the same 2 tokens (the new
        shingle must match); the gate counts such candidate pairs (0);
        one-side-salted / cross-replica pairs only DECREASE (I/(U+1));
      cosine: the 1e-4 per-replica perturbation shifts any dot by at most
        2*max||e||*max||d||+max||d||^2 (computed from the data, ~1.5e-2);
        the gate re-scores every base pair within that window below 0.45
        against ALL 100 replica combinations in the ACTUAL sf1 file and
        records whether every twin dot stays >= threshold (cos_twin_ok in
        the assumptions block -- EVIDENCE for any future twin-reliant
        derivation, not a pass/fail input today: the cosine-family
        queries are gated by the exact numpy oracle below, which assumes
        nothing about twins; a violation prints a warning);
  - demotions (edges lost in salted replicas) cannot split a family:
    the replica-0 copy of every base edge is untouched and the twin
    edges glue the copies, so connected components are preserved.

Given those checked assumptions, each query has an exact expected
answer at sf1, derived from the (oracle-certified at sf0.1) engine
sf0.1 output -- see QUERIES below. Comparison semantics are
tools/check.py's (sort columns, 6dp rounding, sorted rows).

usage:
  python3 tools/replica_parity.py /root/testdata/sf0.1 bigdata/sf1synth /tmp/rp [factor]
The tool runs graft.Verify for the 7 queries at both scales (set
SPARK_GRAFT_RP_SKIP_VERIFY=1 to reuse existing dumps;
SPARK_GRAFT_RP_VERIFY_TIMEOUT to raise the dump-phase budget), then
writes <work>/replica_parity.json and merges the block into
CORRECTNESS_sf1.json if that file exists in the CWD.

SPARK_GRAFT_RP_ONLY=q1,q2 restricts which queries RUN at the big scale;
the rest are stamped status "skipped" with SPARK_GRAFT_RP_SKIP_NOTE --
explicit in the artifact, never silently dropped, and never counted as
pass. Used by the factor-100 tier where the exact-jaccard family's
intersection exchange exceeds one box's scratch disk (SCALING.md
"Factor-100 tier"); every RUN query must still pass for exit 0.
"""
import glob
import json
import os
import subprocess
import sys

import duckdb
import numpy as np
import pandas as pd

QUERIES = [
    # (name, mode) -- mode documents HOW the sf1 answer is derived
    ("x_pipeline", "full-output"),          # dedup keep-set collapses to replica-0 keepers
    ("x_cosine_pairs", "exact-numpy"),      # full n^2 oracle, bit-identical dot fold
    ("x_editdist_pairs", "replica0-subset"),# pair-local; twin candidates excluded by restriction
    ("x_dedup_cluster", "replica0-slice"),  # cluster_id/keep exact, n_cluster = factor x base
    ("x_vec_cluster", "exact-numpy"),       # union-find over the exact numpy pair set
    ("x_split_leakfree", "derived"),        # n_docs x factor, n_clusters/leaky unchanged
    ("x_forget", "derived"),                # closed-form from base clusters + mod-97 arithmetic
]

DOT = ("list_reduce(list_transform(range(1, len({a}) + 1), "
       "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)")


def normalize(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].replace([np.inf, -np.inf], np.nan).round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        raise RuntimeError(f"no engine output for {name} under {outdir}")
    return pd.concat([pd.read_parquet(f) for f in files])


def frames_equal(a, b):
    a, b = normalize(a), normalize(b)
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
            xa, ya = x.astype(float).values, y.astype(float).values
            neq = ~((np.isnan(xa) & np.isnan(ya)) | (xa == ya))
        else:
            neq = ~((x.isna() & y.isna()) | (x.astype(str) == y.astype(str))).values
        if neq.any():
            i = int(np.argmax(neq))
            return False, f"{c}: {int(neq.sum())} diffs, first@{i} sf1={x.iloc[i]} expected={y.iloc[i]}"
    return True, ""


def run_verify(sfdir, outdir, names=None):
    here = os.path.dirname(os.path.abspath(__file__))
    names = names or [q for q, _ in QUERIES]
    # the 7-query Verify takes ~10 min at factor 10 but hours at factor
    # 100 (x_cosine_pairs alone is ~20G pair dots at 200k vectors) --
    # overridable so the big tiers don't die mid-dump; partial dumps are
    # resumable via SPARK_GRAFT_RP_SKIP_VERIFY=1 after a manual Verify of
    # the missing queries into the same outdir
    timeout_s = int(os.environ.get("SPARK_GRAFT_RP_VERIFY_TIMEOUT", "3600"))
    r = subprocess.run(
        [os.path.join(here, "run_main.sh"), "graft.Verify", sfdir, outdir] + names,
        capture_output=True, text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(f"Verify failed for {sfdir}: {r.stderr[-2000:]}")


def main():
    sf01, sf1, work = sys.argv[1], sys.argv[2], sys.argv[3]
    factor = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    # SPARK_GRAFT_RP_ONLY (comma-separated) restricts which queries RUN at
    # the big scale; the rest are stamped "skipped" with an explicit note
    # (SPARK_GRAFT_RP_SKIP_NOTE) -- never silently dropped. Used by the
    # factor-100 tier, where the exact-jaccard family's intersection
    # exchange (~15k * C(F,2) * 100 rows) exceeds a single box's scratch
    # disk while the exact-numpy cosine family streams fine (SCALING.md
    # "Factor-100 tier").
    only = set(q for q in os.environ.get("SPARK_GRAFT_RP_ONLY", "").split(",") if q)
    unknown_only = only - {q for q, _ in QUERIES}
    if unknown_only:
        sys.exit(f"SPARK_GRAFT_RP_ONLY names not in QUERIES: {sorted(unknown_only)}")
    run_set = [q for q, _ in QUERIES if not only or q in only]
    skip_note = os.environ.get(
        "SPARK_GRAFT_RP_SKIP_NOTE",
        "not run in this invocation (SPARK_GRAFT_RP_ONLY subset)")
    os.makedirs(work, exist_ok=True)
    d01, d1 = f"{work}/sf01", f"{work}/sf1"
    if os.environ.get("SPARK_GRAFT_RP_SKIP_VERIFY") != "1":
        print("== running graft.Verify at sf0.1 (reference; oracle-certified) ==", flush=True)
        # sf0.1 always dumps all seven: cheap, and derived oracles chain
        # through sf0.1 dumps of queries outside the run set (x_forget
        # needs x_dedup_cluster's base cluster map)
        run_verify(sf01, d01)
        print("== running graft.Verify at sf1 ==", flush=True)
        run_verify(sf1, d1, run_set)

    # anchor: the sf0.1 reference dumps are themselves DuckDB-certified
    # here (tractable at sf0.1), so the derivations chain back to the
    # oracle, not to the engine trusting itself
    here = os.path.dirname(os.path.abspath(__file__))
    chk = subprocess.run(
        [sys.executable, os.path.join(here, "check.py"), sf01, d01] + [q for q, _ in QUERIES],
        capture_output=True, text=True, timeout=1800)
    sf01_certified = "0 fail" in chk.stdout and chk.returncode == 0
    print(f"sf0.1 reference oracle check: {'PASS' if sf01_certified else 'FAIL'}", flush=True)
    if not sf01_certified:
        print(chk.stdout[-1500:], flush=True)
        # ADVICE r13: an uncertified anchor makes every derived comparison
        # engine-vs-engine self-consistency -- exactly the unanchored
        # scenario this gate exists to prevent. The anchor failure FAILS
        # every non-exact-numpy query below (and so the exit code); the
        # exact-numpy oracle recomputes from the sf1 file directly and
        # does not chain through the sf0.1 dumps, so it stands.
        print("ANCHOR UNCERTIFIED: all derived/replica0-subset/full-output "
              "queries will be marked fail", flush=True)

    def pq(path):  # literal single file, or a partitioned ScaleUp dir
        return f"{path}/*.parquet" if os.path.isdir(path) else path

    con = duckdb.connect()
    # optional politeness cap for runs that overlap other work (DuckDB
    # defaults to all cores; the gate is correctness-only, not timed)
    rp_threads = os.environ.get("SPARK_GRAFT_RP_THREADS")
    if rp_threads:
        con.execute(f"SET threads TO {int(rp_threads)}")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq(sf01 + '/documents.parquet')}')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq(sf01 + '/embeddings.parquet')}')")
    con.execute(f"CREATE VIEW emb1 AS SELECT * FROM read_parquet('{pq(sf1 + '/embeddings.parquet')}')")
    k_doc = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    k_vec = con.execute("SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]

    # ---------------------------------------------------------- assumptions
    assumptions = {}
    # A1: jaccard promotion impossible for THIS corpus: no doc under 3
    # tokens (every twin edge exists) and no candidate pair at U = 2I+1
    # with a shared 2-token suffix (no within-replica promotion)
    assumptions["jac_short_docs"] = con.execute(
        "SELECT count(*) FROM (SELECT list_filter(string_split(text,' '), t->t<>'') tk "
        "FROM documents) WHERE len(tk) < 3").fetchone()[0]
    wp = con.execute("""
        WITH toks AS (SELECT *, list_filter(string_split(text, ' '), t -> t <> '') AS tk FROM documents),
        sh AS (SELECT doc_id, tk, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(
               range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS s FROM toks),
        post AS (SELECT doc_id, unnest(s) AS sng FROM sh),
        sz AS (SELECT doc_id, len(s) AS n, tk[-2] || ' ' || tk[-1] AS suf2 FROM sh),
        co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS co FROM post a
               JOIN post b ON a.sng = b.sng WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        w AS (SELECT co, sa.n + sb.n - co AS u, sa.suf2 = sb.suf2 AS same_suf
              FROM co JOIN sz sa ON sa.doc_id = co.a_id JOIN sz sb ON sb.doc_id = co.b_id)
        SELECT count(*) FILTER (WHERE u = 2*co + 1) AS window_pairs,
               count(*) FILTER (WHERE u = 2*co + 1 AND same_suf) AS promotable FROM w""").fetchone()
    assumptions["jac_window_pairs"], assumptions["jac_promotable"] = int(wp[0]), int(wp[1])

    need_cos = bool({"x_cosine_pairs", "x_vec_cluster"} & set(run_set))

    oracle_pairs = oracle_clusters = None
    if need_cos:
        # A2: cosine promotion -- bound the perturbation shift from the
        # data, then re-score every base pair within the window below the
        # 0.45 threshold against ALL factor^2 replica combinations in the
        # sf1 file. (Measured at round 13: ~70 of the window variants DO
        # cross 0.45 -- which is exactly why the cosine-family queries are
        # gated by the EXACT numpy oracle below instead of the factor-x
        # derivation the jaccard family earns with its zero-promotion
        # proof.) Guarded by need_cos: at factor 100 the window re-scoring
        # is factor^2 = 10,000 combos per window pair and only informs the
        # cosine family.
        max_e = con.execute(
            f"SELECT max(sqrt({DOT.format(a='embedding', b='embedding')})) FROM embeddings").fetchone()[0]
        max_d = con.execute(f"""
            SELECT max(sqrt(list_reduce(list_transform(range(0, 64),
                   i -> pow(r.r * 1e-4 * sin(i + e.vec_id + r.r * {k_vec}), 2)), (x, y) -> x + y)))
            FROM embeddings e, (SELECT unnest(range(1, {factor})) AS r) r""").fetchone()[0]
        # one side or both sides perturbed; + 1e-6 for float32 rounding slack
        shift_bound = 2 * max_e * max_d + max_d * max_d + 1e-6
        assumptions["cos_shift_bound"] = round(shift_bound, 6)
        window_lo = 0.45 - max(shift_bound, 0.02)
        cos = con.execute(f"""
            WITH wp AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM embeddings a, embeddings b
                  WHERE a.vec_id < b.vec_id
                  AND {DOT.format(a='a.embedding', b='b.embedding')} >= {window_lo}
                  AND {DOT.format(a='a.embedding', b='b.embedding')} < 0.45),
            rep AS (SELECT unnest(range(0, {factor})) AS r),
            var AS (SELECT wp.a_id + r1.r * {k_vec} AS aa, wp.b_id + r2.r * {k_vec} AS bb
                    FROM wp, rep r1, rep r2),
            d AS (SELECT {DOT.format(a='ea.embedding', b='eb.embedding')} AS sim
                  FROM var JOIN emb1 ea ON ea.vec_id = var.aa JOIN emb1 eb ON eb.vec_id = var.bb)
            SELECT count(*), count(*) FILTER (WHERE sim >= 0.45) FROM d""").fetchone()
        assumptions["cos_window_variants"], assumptions["cos_promoted"] = int(cos[0]), int(cos[1])
        twin = con.execute(f"""
            WITH rep AS (SELECT unnest(range(1, {factor})) AS r),
            d AS (SELECT {DOT.format(a='e0.embedding', b='er.embedding')} AS sim
                  FROM embeddings e0, rep JOIN emb1 er ON er.vec_id = e0.vec_id + rep.r * {k_vec})
            SELECT min(sim) FROM d""").fetchone()[0]
        assumptions["cos_twin_min"] = round(float(twin), 6)
        # ADVICE r13: the recorded twin minimum is now actually COMPARED to
        # the threshold, not merely observed. No current query derivation
        # relies on twin cosine edges (the cosine family uses the exact
        # numpy oracle), so a violation warns loudly but does not gate --
        # any future derivation that leans on twin edges must require
        # cos_twin_ok.
        assumptions["cos_twin_ok"] = bool(assumptions["cos_twin_min"] >= 0.45)
        if not assumptions["cos_twin_ok"]:
            print(f"WARNING: cos_twin_min {assumptions['cos_twin_min']} < 0.45 -- twin cosine "
                  "edges are NOT all above threshold; no current derivation depends on them, "
                  "but do not add one without gating on cos_twin_ok", flush=True)

    jac_ok = (assumptions["jac_short_docs"] == 0 and assumptions["jac_promotable"] == 0)

    if need_cos:
        # ------------------------------------------ exact cosine oracle
        # The cosine oracle is intractable in DuckDB only because
        # list_reduce interprets one lambda per element; the SAME
        # computation as a dimension-ordered accumulation of outer
        # products is seconds in numpy and BIT-IDENTICAL to the engine's
        # graft_dot (both evaluate s_{i+1} = s_i + (double)a_i *
        # (double)b_i in ascending dim order -- ArrayOps.scala ArrayDot),
        # so the full n^2 pair set at sf1 is an exact oracle, no replica
        # derivation needed.
        emb = con.execute("SELECT vec_id, embedding FROM emb1 ORDER BY vec_id").df()
        ids = emb["vec_id"].to_numpy()
        E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)  # float32 -> exact
        n, dim = E.shape
        # row-blocked so memory stays O(B x n) -- the same code carries an
        # sf10 build (200k vectors) without a 320 GB gram matrix.
        # B is CACHE-sized, not memory-sized (r15): at B=4096 the per-dim
        # accumulate streamed two ~6.5 GB arrays through DRAM 64 times per
        # block (~80 TB of traffic at n=200k -- measured 4.5+ h single
        # core); at B=16 the block gram (~25 MB) stays in L3 and the only
        # DRAM traffic is the contiguous transposed column reads (~1.3 TB,
        # minutes). The fold is IDENTICAL -- each gram entry accumulates
        # s_{d+1} = s_d + a_d*b_d in ascending dim order either way, so
        # the result is bit-equal (np.array_equal-verified vs the old
        # blocking at n=2k) and stays the engine ArrayDot contract.
        B = 16
        ET = np.ascontiguousarray(E.T)
        acc_a, acc_b, acc_s = [], [], []
        tmp = np.empty((min(B, n), n))
        for i0 in range(0, n, B):
            i1 = min(i0 + B, n)
            nb = i1 - i0
            Gb = np.zeros((nb, n))
            for d in range(dim):
                np.multiply.outer(ET[d, i0:i1], ET[d], out=tmp[:nb])
                Gb += tmp[:nb]
            for r in range(nb):
                gi = i0 + r
                row = Gb[r, gi + 1:]
                idx = np.nonzero(row >= 0.45)[0]
                if idx.size:
                    acc_a.append(np.full(idx.size, ids[gi]))
                    acc_b.append(ids[gi + 1 + idx])
                    acc_s.append(row[idx])
        del tmp
        pa = np.concatenate(acc_a) if acc_a else np.array([], dtype=ids.dtype)
        pb = np.concatenate(acc_b) if acc_b else np.array([], dtype=ids.dtype)
        psim = np.concatenate(acc_s) if acc_s else np.array([])
        oracle_pairs = pd.DataFrame({"a_id": pa, "b_id": pb, "sim": np.round(psim, 6)})
        assumptions["numpy_pairs_sf1"] = int(len(oracle_pairs))

        # union-find over the exact pair set -> exact x_vec_cluster oracle
        parent = {int(v): int(v) for v in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pa, pb):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        root = {v: find(int(v)) for v in ids}
        sizes = {}
        for v in ids:
            sizes[root[int(v)]] = sizes.get(root[int(v)], 0) + 1
        oracle_clusters = pd.DataFrame({
            "vec_id": ids,
            "cluster_id": [root[int(v)] for v in ids],
            "n_cluster": [sizes[root[int(v)]] for v in ids],
            "keep": [int(v) == root[int(v)] for v in ids],
        })

    # ------------------------------------------------------------- queries
    results = {}

    def record(name, ok, why, note):
        mode = dict(QUERIES)[name]
        if mode != "exact-numpy" and not sf01_certified:
            extra = "" if ok else " -- also: " + why
            ok, why = False, ("sf0.1 anchor uncertified: comparison would be engine-vs-engine "
                              "self-consistency" + extra)
        results[name] = {"mode": mode, "status": "pass" if ok else "fail", "note": note}
        if not ok:
            results[name]["why"] = why
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({mode}){'' if ok else ' -- ' + why}", flush=True)

    def skip(name):
        mode = dict(QUERIES)[name]
        results[name] = {"mode": mode, "status": "skipped", "note": skip_note}
        print(f"{name}: SKIPPED ({mode}) -- {skip_note}", flush=True)

    if "x_pipeline" in run_set:
        # x_pipeline: near-dup keep = global cluster min = the replica-0
        # keeper, so the kept set IS the sf0.1 kept set -> full-output parity
        ok, why = frames_equal(load(d1, "x_pipeline"), load(d01, "x_pipeline"))
        record("x_pipeline", ok and jac_ok, why or "jaccard assumptions violated",
               "dedup collapses the 10x corpus to the replica-0 keepers; output equals sf0.1 verbatim")
    else:
        skip("x_pipeline")

    if "x_cosine_pairs" in run_set:
        # exact numpy oracle, FULL sf1 output (cross-replica twin pairs at
        # cos~1 and promoted borderline pairs included -- nothing is assumed)
        ok, why = frames_equal(load(d1, "x_cosine_pairs"), oracle_pairs)
        record("x_cosine_pairs", ok, why,
               "full n^2 oracle recomputed in numpy with the engine's exact "
               "dim-ordered double fold; DuckDB's 270s DNF was interpreter cost, not math")
    else:
        skip("x_cosine_pairs")

    if "x_editdist_pairs" in run_set:
        # pair-local subset: replica-0-internal pairs of the sf1 run must be
        # the sf0.1 pairs verbatim (replica-0 bytes are identical; jac/lev
        # of a pair do not depend on other docs)
        e1 = load(d1, "x_editdist_pairs")
        ok, why = frames_equal(e1[(e1.a_id < k_doc) & (e1.b_id < k_doc)], load(d01, "x_editdist_pairs"))
        record("x_editdist_pairs", ok, why,
               "twin candidates cross replicas (jac n/(n+1) >= 0.3) but jac/lev are pair-local; "
               "replica-0-internal subset equals sf0.1")
    else:
        skip("x_editdist_pairs")

    if "x_dedup_cluster" in run_set:
        # cluster slices: identity + keep exact; family size = factor x base
        e1 = load(d1, "x_dedup_cluster")
        s = e1[e1.doc_id < k_doc].copy()
        b = load(d01, "x_dedup_cluster").copy()
        b["n_cluster"] = b["n_cluster"] * factor
        ok, why = frames_equal(s, b)
        record("x_dedup_cluster", ok and jac_ok, why or "jaccard assumptions violated",
               "twin edges glue each base cluster's copies into one family: cluster_id/keep "
               "unchanged, n_cluster = factor x base")
    else:
        skip("x_dedup_cluster")

    if "x_vec_cluster" in run_set:
        ok, why = frames_equal(load(d1, "x_vec_cluster"), oracle_clusters)
        record("x_vec_cluster", ok, why,
               "exact oracle: union-find over the numpy pair set (the factor-x derivation "
               "is UNSOUND here -- cos_promoted > 0 shows perturbed borderline pairs cross "
               "0.45 -- so the gate computes the true sf1 components instead)")
    else:
        skip("x_vec_cluster")

    if "x_split_leakfree" in run_set:
        # x_split_leakfree: cluster ids (and so buckets/splits) unchanged ->
        # per split n_docs scales by factor, n_clusters and leaky do not
        e1 = load(d1, "x_split_leakfree")
        b = load(d01, "x_split_leakfree").copy()
        b["n_docs"] = b["n_docs"] * factor
        ok, why = frames_equal(e1, b)
        record("x_split_leakfree", ok and jac_ok, why or "jaccard assumptions violated",
               "splits hash cluster_id which is replica-invariant; n_docs x factor, "
               "n_clusters/leaky_clusters unchanged (leak-free by construction at any scale)")
    else:
        skip("x_split_leakfree")

    if "x_forget" in run_set:
        # x_forget: closed-form from the base cluster map + key arithmetic --
        # replica r of doc d has id d + r*k_doc, so its own mod-97 direct-hit
        # set differs per replica and propagation closes over the FAMILY
        lab = f"read_parquet('{d01}/x_dedup_cluster/*.parquet')"
        exp = con.execute(f"""
            WITH lab AS (SELECT doc_id, cluster_id FROM {lab}),
            rep AS (SELECT unnest(range(0, {factor})) AS r),
            mem AS (SELECT l.doc_id, l.cluster_id, rep.r,
                           (l.doc_id + rep.r * {k_doc}) % 97 = 5 AS direct FROM lab l, rep),
            hit AS (SELECT DISTINCT cluster_id FROM mem WHERE direct),
            j AS (SELECT m.doc_id, m.r, m.direct, h.cluster_id IS NOT NULL AS gone, d.source
                  FROM mem m JOIN documents d ON d.doc_id = m.doc_id
                  LEFT JOIN hit h ON h.cluster_id = m.cluster_id)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN direct THEN 1 ELSE 0 END) AS BIGINT) AS n_direct,
                   CAST(sum(CASE WHEN gone AND NOT direct THEN 1 ELSE 0 END) AS BIGINT) AS n_propagated,
                   CAST(count(*) - sum(CASE WHEN gone THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM j GROUP BY source ORDER BY source""").df()
        ok, why = frames_equal(load(d1, "x_forget"), exp)
        record("x_forget", ok and jac_ok, why or "jaccard assumptions violated",
               "derived oracle: family-closure of per-replica mod-97 hits over the base "
               "cluster map (linear arithmetic, no closure recomputation)")
    else:
        skip("x_forget")

    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_skipped = sum(1 for r in results.values() if r["status"] == "skipped")
    block = {
        "protocol": (
            f"graft.Verify at {sf1} (factor {factor}) vs expected answers derived from the "
            f"oracle-certified sf0.1 outputs via ScaleUp's disjoint-universe construction; "
            "assumptions (twin-edge existence, zero threshold promotions) are checked "
            "against the data, not assumed -- see tools/replica_parity.py header"),
        "sf01_reference_oracle_certified": sf01_certified,
        "assumptions": assumptions,
        "queries": results,
        "n_pass": n_pass,
        "n_fail": len(results) - n_pass - n_skipped,
        "n_skipped": n_skipped,
        # run stamp (round 17): a re-run whose counts happen to match the
        # committed block was previously byte-identical, leaving no
        # committed evidence the gate actually re-ran this round
        "run_utc": __import__("datetime").datetime.now(
            __import__("datetime").timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    with open(f"{work}/replica_parity.json", "w") as f:
        json.dump(block, f, indent=1)
    # factor 10 is THE sf1 gate block; other factors merge under their own
    # key so a bigger-factor run never clobbers the sf1 evidence
    key = "replica_parity" if factor == 10 else f"replica_parity_factor{factor}"
    # merge is MANDATORY (r15 verdict #2): resolve the artifact at the
    # repo root regardless of CWD, and fail loudly if it is not there --
    # the silent skip-on-absent is exactly how two rounds of docs claimed
    # a block that never landed. Path overridable for tests.
    artifact = os.environ.get(
        "SPARK_GRAFT_CORRECTNESS_ARTIFACT",
        os.path.join(os.path.dirname(here), "CORRECTNESS_sf1.json"))
    if not os.path.exists(artifact):
        sys.exit(f"FATAL: correctness artifact {artifact} not found -- the {key} "
                 "block MUST merge into it; refusing to finish without banking evidence")
    doc = json.load(open(artifact))
    doc[key] = block
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged {key} into {artifact}", flush=True)
    print(f"== replica parity: {n_pass} pass, {len(results) - n_pass - n_skipped} fail, "
          f"{n_skipped} skipped ==")
    # exit gates on BOTH the per-query results and the anchor certification
    # (ADVICE r13) -- record() already fails derived queries when the
    # anchor is uncertified, so the second term is belt-and-braces should
    # the query set ever become all-exact-numpy. Skipped queries don't
    # gate (they're stamped, not judged) -- every RUN query must pass.
    sys.exit(0 if (n_pass == len(run_set) and sf01_certified) else 1)


if __name__ == "__main__":
    main()
