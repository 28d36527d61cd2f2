#!/usr/bin/env python3
"""Driver-like t2 self-check: compare Verify output parquet against the
DuckDB oracle SQL, per query. Usage: check.py <sfDir> <verifyOutDir> [name...]
"""
import json
import re
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


# Exact value-replay for the rows the banded twin does NOT cover (r14 ask
# #3): the engine rows outside the twin's buckets are joined back to the
# base tables by id and their values recomputed EXACTLY — same exactness
# discipline as each entry's full oracle (textually derived from it; any
# drift fails the equality loudly). Together with the twin this certifies
# engine rows by VALUE; completeness stays certified on the banded subset
# (the twin's no-undercount check). Residuals above SAMPLE_CAP rows are
# value-replayed on a DETERMINISTIC arithmetic sample (reported as such)
# so the ×10 dup-mode pair explosions stay inside the batch cap.
RESIDUAL_SAMPLE_CAP = 2_000_000

# The oracle-less entries certified by Verify's in-run error bands
# (BandChecks.scala). Their PASS/FAIL comes from the band_checks.json
# sidecar; when an in-scope entry is missing from it, main() FAILS that
# entry loudly instead of letting it drop out of the tally (r15 ADVICE).
BAND_ENTRIES = ["q_agg_approx", "q_agg_percentile_approx", "q_text_compressibility"]

RESIDUAL_REPLAY = {
    "q_dedup_embed": {
        "ids": ["v1", "v2"],
        "sql": """
WITH pr AS (
 SELECT r.v1, r.v2, a.embedding AS e1, b.embedding AS e2
 FROM residual_pairs r
 JOIN embeddings a ON a.vec_id = r.v1
 JOIN embeddings b ON b.vec_id = r.v2),
un AS (
 SELECT v1, v2, unnest(e1) AS x, unnest(e2) AS y FROM pr),
s AS (
 SELECT v1, v2,
  CAST(CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS dot,
  CAST(CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS n1,
  CAST(CAST(sum(CAST(round(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS n2
 FROM un GROUP BY v1, v2)
SELECT v1, v2, dot / (sqrt(n1) * sqrt(n2)) AS cos,
 CAST(dot / (sqrt(n1) * sqrt(n2)) >= 0.8 AS INT) AS is_near_dup FROM s
WHERE dot / (sqrt(n1) * sqrt(n2)) >= 0.4
ORDER BY v1, v2""",
    },
    # signature recompute via the q_dedup_simhash entry's OWN oracle text
    # (substituted at runtime from oracle_sql.json — one signature
    # definition, zero drift), keyed by the residual pairs
    "q_dedup_simhash_pairs": {
        "ids": ["d1", "d2"],
        "sql_template": """
WITH sigs AS ({oracle[q_dedup_simhash]}),
p AS (
 SELECT r.d1, r.d2, bit_count(xor(a.simhash, b.simhash)) AS h
 FROM residual_pairs r
 JOIN sigs a ON a.doc_id = r.d1
 JOIN sigs b ON b.doc_id = r.d2)
SELECT d1, d2, CAST(h AS INT) AS hamming FROM p
WHERE h <= 3 ORDER BY d1, d2""",
    },
    # arithmetic hash recompute (the q_multimodal_phash oracle's CTE) but
    # keyed by the residual pairs — no candidate join, so it stays linear
    # in the residual size even at dup-mode x10
    "q_multimodal_phash": {
        "ids": ["d1", "d2"],
        "sql": """
WITH g AS (
 SELECT doc_id, CAST(i.idx AS INT) AS idx
 FROM documents, LATERAL (SELECT unnest(generate_series(0, 63)) AS idx) i),
v AS (
 SELECT doc_id, idx,
  CASE WHEN doc_id % 3 = 0 AND idx = doc_id % 64
   THEN 240 - (CASE WHEN (((doc_id % 97) * 2654435761 + idx * 40503) // 128) % 2 = 0
               THEN 20 ELSE 220 END)
   ELSE (CASE WHEN (((doc_id % 97) * 2654435761 + idx * 40503) // 128) % 2 = 0
         THEN 20 ELSE 220 END) END AS lum
 FROM g),
m AS (SELECT doc_id, CAST(sum(lum) AS BIGINT) // 64 AS mean FROM v GROUP BY doc_id),
bits AS (
 SELECT v.doc_id, idx, CASE WHEN lum > mean THEN 1 ELSE 0 END AS b
 FROM v JOIN m USING (doc_id)),
segs AS (
 SELECT doc_id, idx // 16 AS seg,
  CAST(sum(b * (1 << (idx % 16))) AS BIGINT) AS seg_val
 FROM bits GROUP BY doc_id, idx // 16),
-- pivot to one row per doc so BOTH pair joins key on the UNIQUE doc_id:
-- joining the tall segs table twice lets the optimizer pair a x b on the
-- 4-value seg key first (a 10^10-row intermediate at x10 — measured 18 GiB
-- of spill); keyed on doc_id no join order can blow up
segp AS (
 SELECT doc_id,
  max(CASE WHEN seg = 0 THEN seg_val END) AS s0,
  max(CASE WHEN seg = 1 THEN seg_val END) AS s1,
  max(CASE WHEN seg = 2 THEN seg_val END) AS s2,
  max(CASE WHEN seg = 3 THEN seg_val END) AS s3
 FROM segs GROUP BY doc_id),
p AS (
 SELECT r.d1, r.d2,
  bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1)) +
  bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3)) AS hsum
 FROM residual_pairs r
 JOIN segp a ON a.doc_id = r.d1
 JOIN segp b ON b.doc_id = r.d2)
SELECT d1, d2, CAST(hsum AS INT) AS hamming
FROM p WHERE hsum <= 3
ORDER BY d1, d2""",
    },
}


def record_cert(out_dir, name, **fields):
    """Machine-readable banded-certification coverage sidecar (r15 VERDICT
    ask #5): per entry — twin rows, residual rows replayed vs total,
    sample divisor, stratification, PASS/FAIL — so the driver (and the
    ×10/×63 recert tooling) reads certification SCOPE from data instead
    of parsing prose. Accumulates across per-entry --banded invocations.
    Path: $GRAFT_BANDED_CERT_OUT or <out_dir>/banded_cert.json.
    """
    path = os.environ.get("GRAFT_BANDED_CERT_OUT") or os.path.join(
        out_dir, "banded_cert.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data[name] = fields
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


def resolve_replay(name, oracle):
    """RESIDUAL_REPLAY entry -> {ids, sql}, expanding {oracle[<entry>]}
    placeholders from the run's own oracle_sql.json (one signature
    definition shared with the entry's oracle, zero drift)."""
    r = RESIDUAL_REPLAY.get(name)
    if r is None:
        return None
    sql = r.get("sql")
    if sql is None:
        sql = re.sub(r"\{oracle\[([a-z0-9_]+)\]\}",
                     lambda m: oracle[m.group(1)].rstrip(), r["sql_template"])
    return {"ids": r["ids"], "sql": sql}


def stratified_sample_sql(con, src, collist, ids, stride, dest="resid_s"):
    """Deterministic STRATIFIED residual sample (r15 VERDICT ask #5): the
    old uniform pair-hash sample could leave small strata with ZERO
    replayed rows while the value bugs the capped twins exist for
    concentrate in specific cliques. Stratum = the first id (each clique
    of size k appears as id0 groups of sizes k-1..1, so coverage is
    clique-proportional); every stratum replays ceil(n_g/stride) rows —
    at least one — via a per-group row_number, deterministic by the
    (id0, id1) ordering.
    """
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE {dest} AS SELECT {collist} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {ids[0]} ORDER BY {ids[1]}) AS rn "
        f"FROM {src}) WHERE (rn - 1) % {stride} = 0")


def banded_sql(con, pq, name, twin, oracle, out_dir):
    """The banded cert's LARGE path: identical semantics to banded(), but
    set-algebra (presence, residual, sample, replay compare) runs as
    DuckDB EXCEPT/joins over the parquet directly — no pandas
    materialization of the multi-million-row engine frame. Row equality
    via EXCEPT is exact (same contract as check_exact)."""
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM read_parquet({pq!r}) LIMIT 0").description]
    collist = ", ".join(sorted(cols))
    # compare column SETS before projecting (r15 ADVICE): projecting the
    # engine's column list out of the oracle first would throw a Binder
    # error (traceback, not a diagnostic) when the oracle lacks one
    wcols = sorted(d[0] for d in con.execute(
        f"SELECT * FROM ({oracle[twin]}) LIMIT 0").description)
    if sorted(cols) != wcols:
        print(f"FAIL {name}: banded columns {sorted(cols)} vs {wcols}")
        record_cert(out_dir, name, twin=twin, mode="columns_mismatch", passed=False)
        return False
    con.execute(f"CREATE OR REPLACE TEMP VIEW got_v AS SELECT {collist} FROM read_parquet({pq!r})")
    con.execute(f"CREATE OR REPLACE TEMP TABLE want_t AS SELECT {collist} FROM ({oracle[twin]})")
    n_got = con.execute("SELECT count(*) FROM got_v").fetchone()[0]
    n_want = con.execute("SELECT count(*) FROM want_t").fetchone()[0]
    if n_got < n_want:
        print(f"FAIL {name}: engine rows {n_got} < banded twin rows {n_want}")
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                    mode="undercount", passed=False)
        return False
    if n_want == 0:
        print(f"FAIL {name}: banded twin returned 0 rows against {n_got} engine rows — nothing certified")
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=0,
                    mode="vacuous_twin", passed=False)
        return False
    missing = con.execute(
        f"SELECT count(*) FROM (SELECT {collist} FROM want_t EXCEPT SELECT {collist} FROM got_v)"
    ).fetchone()[0]
    if missing:
        print(f"FAIL {name}: {missing} banded-twin rows absent from engine output")
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                    mode="twin_rows_missing", passed=False)
        return False
    replay = resolve_replay(name, oracle)
    if replay is None:
        print(f"PASS {name} (banded twin {twin}: {n_want} of {n_got} rows value-certified)")
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                    residual_total=n_got - n_want, residual_replayed=0,
                    sample_divisor=None, stratified=False, mode="twin_subset",
                    passed=True)
        return True
    if n_got > 500_000_000:
        # the EXCEPT below materializes the full engine frame as a temp
        # table — past half a billion rows that is a disk-wall, not a
        # cert. Certify presence only and say so LOUDLY; the stratified
        # value-replay still runs, directly against a sample of got.
        stride = (n_got + RESIDUAL_SAMPLE_CAP - 1) // RESIDUAL_SAMPLE_CAP
        ids0 = replay["ids"]
        stratified_sample_sql(con, "got_v", collist, ids0, stride)
        con.execute(f"CREATE OR REPLACE TEMP TABLE residual_pairs AS SELECT {', '.join(ids0)} FROM resid_s")
        n_samp = con.execute("SELECT count(*) FROM resid_s").fetchone()[0]
        con.execute(f"CREATE OR REPLACE TEMP TABLE replay_t AS SELECT {collist} FROM ({replay['sql']})")
        n_rep = con.execute("SELECT count(*) FROM replay_t").fetchone()[0]
        mism = con.execute(
            f"SELECT count(*) FROM (SELECT {collist} FROM resid_s EXCEPT SELECT {collist} FROM replay_t)"
        ).fetchone()[0]
        ok = n_rep == n_samp and not mism
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                    residual_total=n_got, residual_replayed=n_samp,
                    sample_divisor=stride, stratified=True,
                    mode="presence_plus_stratified_sample", passed=ok)
        if not ok:
            print(f"FAIL {name}: sampled value-replay mismatch ({n_rep} replay rows for "
                  f"{n_samp} sampled engine rows, {mism} value diffs)")
            return False
        print(f"PASS {name} (banded twin {twin}: {n_want} rows presence-certified + "
              f"value-replay of a deterministic stratified 1/{stride}-per-stratum engine "
              f"sample ({n_samp} rows) of {n_got} total — residual EXCEPT skipped past 500M rows)")
        return True
    ids = replay["ids"]
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE resid_t AS "
        f"SELECT {collist} FROM got_v EXCEPT SELECT {collist} FROM want_t")
    n_resid = con.execute("SELECT count(*) FROM resid_t").fetchone()[0]
    if n_resid == 0:
        print(f"PASS {name} (banded twin {twin}: {n_want} of {n_got} rows value-certified — full cover)")
        record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                    residual_total=0, residual_replayed=0, sample_divisor=None,
                    stratified=False, mode="full_cover", passed=True)
        return True
    sampled = ""
    src = "resid_t"
    stride = None
    if n_resid > RESIDUAL_SAMPLE_CAP:
        stride = (n_resid + RESIDUAL_SAMPLE_CAP - 1) // RESIDUAL_SAMPLE_CAP
        stratified_sample_sql(con, "resid_t", collist, ids, stride)
        src = "resid_s"
        sampled = f" (deterministic stratified 1/{stride}-per-stratum sample of {n_resid})"
    con.execute(f"CREATE OR REPLACE TEMP TABLE residual_pairs AS SELECT {', '.join(ids)} FROM {src}")
    n_samp = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
    con.execute(f"CREATE OR REPLACE TEMP TABLE replay_t AS SELECT {collist} FROM ({replay['sql']})")
    n_rep = con.execute("SELECT count(*) FROM replay_t").fetchone()[0]
    ok = n_rep == n_samp
    mism = 0
    if ok:
        mism = con.execute(
            f"SELECT count(*) FROM (SELECT {collist} FROM {src} EXCEPT SELECT {collist} FROM replay_t)"
        ).fetchone()[0]
        ok = not mism
    record_cert(out_dir, name, twin=twin, engine_rows=n_got, twin_rows=n_want,
                residual_total=n_resid, residual_replayed=n_samp,
                sample_divisor=stride, stratified=stride is not None,
                mode="residual_replay" if stride is None else "stratified_sampled_residual_replay",
                passed=ok)
    if n_rep != n_samp:
        print(f"FAIL {name}: residual replay produced {n_rep} rows for {n_samp} engine rows "
              f"(an engine row's recomputed value fell outside the entry's own filter)")
        return False
    if mism:
        print(f"FAIL {name}: residual value-replay mismatch on {mism} rows")
        return False
    print(f"PASS {name} (banded twin {twin}: {n_want} rows + residual replay {n_samp} rows{sampled} "
          f"of {n_got} total; completeness certified on the banded subset)")
    return True


def banded(con, out_dir, name, twin):
    """Scale-cert twin (r14 ask #4): certify a quadratic-oracle entry via a
    BOUNDED twin oracle whose output is a deterministic exact-valued SUBSET
    of the entry's output (q_dedup_embed's LSH banding + exact in-bucket
    rerank). Every twin row must appear in the engine output with exact
    values, and the engine must not undercount. This does NOT replace the
    full oracle at base scale — the driver's sf0.01 gate still runs the
    quadratic twin; this makes the x10+ recert attemptable with zero
    declared exclusions."""
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not pq:
        print(f"FAIL {name}: no spark output")
        return False
    # Large engine outputs (the x10 dup-mode pair explosions: 64M rows)
    # stay entirely inside DuckDB — the pandas path below pays multiple
    # stable mergesorts of the full frame and blows the batch cap.
    n_got_raw = con.execute(
        f"SELECT count(*) FROM read_parquet({pq!r})").fetchone()[0]
    if n_got_raw > 5_000_000:
        return banded_sql(con, pq, name, twin, oracle, out_dir)
    got = norm(con.execute(f"SELECT * FROM read_parquet({pq!r})").df())
    want = norm(con.execute(oracle[twin]).df())
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: banded columns {list(got.columns)} vs {list(want.columns)}")
        return False
    if len(got) < len(want):
        print(f"FAIL {name}: engine rows {len(got)} < banded twin rows {len(want)}")
        return False
    if len(want) == 0 and len(got) > 0:
        # anti-vacuity (the r5 empty-hash lesson): a twin that certifies
        # zero of the engine's rows proves nothing — fail loudly rather
        # than reading green
        print(f"FAIL {name}: banded twin returned 0 rows against {len(got)} engine rows — nothing certified")
        return False
    if len(want) == 0 and len(got) == 0:
        # BOTH sides empty (r14 ADVICE): an upstream mis-scale that empties
        # twin and engine together would read green while certifying
        # nothing — require the explicit opt-in before passing
        if os.environ.get("GRAFT_BANDED_ALLOW_EMPTY") == "1":
            print(f"PASS {name} (banded twin {twin}: BOTH EMPTY — allowed by GRAFT_BANDED_ALLOW_EMPTY)")
            return True
        print(f"FAIL {name}: banded twin AND engine both returned 0 rows — vacuous cert "
              f"(set GRAFT_BANDED_ALLOW_EMPTY=1 if this scale is legitimately empty)")
        return False
    merged = want.merge(got, how="left", indicator=True)
    missing = merged[merged["_merge"] != "both"]
    if len(missing):
        print(f"FAIL {name}: {len(missing)} banded-twin rows absent from engine output")
        print(missing.head(3))
        return False
    # residual value-replay (r14 ask #3): engine rows OUTSIDE the twin are
    # recomputed exactly by id — twin + replay = 100% of rows value-certified
    # (or a deterministic sample of the residual above RESIDUAL_SAMPLE_CAP)
    resid = got.merge(want, how="left", indicator=True)
    resid = resid[resid["_merge"] == "left_only"].drop(columns="_merge")
    replay = resolve_replay(name, oracle)
    if len(resid) and replay is not None:
        ids = replay["ids"]
        n_resid = len(resid)
        sampled = ""
        stride = None
        if n_resid > RESIDUAL_SAMPLE_CAP:
            # deterministic STRATIFIED sample (r15 ask #5, same contract
            # as stratified_sample_sql): every id0 stratum replays
            # ceil(n_g/stride) rows — no RNG, stable across machines
            stride = (n_resid + RESIDUAL_SAMPLE_CAP - 1) // RESIDUAL_SAMPLE_CAP
            resid = resid.sort_values(by=ids, kind="mergesort")
            keep = resid.groupby(ids[0]).cumcount() % stride == 0
            resid = resid[keep]
            sampled = f" (deterministic stratified 1/{stride}-per-stratum sample of {n_resid})"
        con.register("residual_pairs", resid[ids])
        try:
            rep = norm(con.execute(replay["sql"]).df())
        finally:
            con.unregister("residual_pairs")
        r = norm(resid)
        def cert(ok):
            record_cert(out_dir, name, twin=twin, engine_rows=len(got),
                        twin_rows=len(want), residual_total=n_resid,
                        residual_replayed=len(r), sample_divisor=stride,
                        stratified=stride is not None,
                        mode="residual_replay" if stride is None
                        else "stratified_sampled_residual_replay", passed=ok)
        if len(rep) != len(r):
            cert(False)
            print(f"FAIL {name}: residual replay produced {len(rep)} rows for {len(r)} engine rows "
                  f"(an engine row's recomputed value fell outside the entry's own filter)")
            return False
        try:
            pd.testing.assert_frame_equal(r, rep, check_exact=True)
        except AssertionError as e:
            cert(False)
            print(f"FAIL {name}: residual value-replay mismatch: {str(e).splitlines()[:4]}")
            return False
        cert(True)
        print(f"PASS {name} (banded twin {twin}: {len(want)} rows + residual replay {len(r)} rows{sampled} "
              f"of {len(got)} total; completeness certified on the banded subset)")
        return True
    if len(resid) == 0:
        print(f"PASS {name} (banded twin {twin}: {len(want)} of {len(got)} rows value-certified — full cover)")
        record_cert(out_dir, name, twin=twin, engine_rows=len(got), twin_rows=len(want),
                    residual_total=0, residual_replayed=0, sample_divisor=None,
                    stratified=False, mode="full_cover", passed=True)
        return True
    print(f"PASS {name} (banded twin {twin}: {len(want)} of {len(got)} rows value-certified)")
    record_cert(out_dir, name, twin=twin, engine_rows=len(got), twin_rows=len(want),
                residual_total=len(resid), residual_replayed=0, sample_divisor=None,
                stratified=False, mode="twin_subset", passed=True)
    return True


def main():
    if len(sys.argv) >= 6 and sys.argv[3] == "--banded":
        sf_dir, out_dir, name, twin = sys.argv[1], sys.argv[2], sys.argv[4], sys.argv[5]
        con = duckdb.connect()
        import spill as spill_mod
        spill_mod.setup_spill(con)
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
        sys.exit(0 if banded(con, out_dir, name, twin) else 1)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Disk hygiene (round-8 postmortem; r12: extracted to tools/spill.py,
    # shared with ln_guard.py): per-PID capped spill dir with
    # start-time-marked orphan sweep. Scripts that set GRAFT_SPILL_DIR own
    # that directory's lifecycle via their own traps.
    import spill as spill_mod
    spill_mod.setup_spill(con)
    for t in TABLES:
        # fixture tables are single files; engine-inflated scale data
        # (ScaleProbe) writes Spark parquet DIRECTORIES of the same name
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({pq!r})").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
            print(f"FAIL {name}: dtypes {dict(g.dtypes.astype(str))} vs {dict(w.dtypes.astype(str))}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: values differ: {' | '.join(msg[:6])}")
            # show first mismatching cells
            for c in g.columns:
                neq = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"   col {c}: got={g[c][i]!r} want={w[c][i]!r} (row {i}, {int(neq.sum())} diffs)")
            n_fail += 1
    # band certifications for the oracle-less entries (Verify's sidecar,
    # r14 ask #4): surface them in the same gate so a violated band reads
    # as a FAIL here too, not only in Verify's exit code
    band_path = os.path.join(out_dir, "band_checks.json")
    bands = json.load(open(band_path)) if os.path.exists(band_path) else {}
    # every band entry IN SCOPE must be accounted for (r15 ADVICE): a
    # missing sidecar (targeted Verify deleted it, or Verify crashed
    # before writing it) must read as FAIL for the in-scope band
    # entries, not as a silently smaller tally
    in_scope = [n for n in BAND_ENTRIES if not only or n in only]
    for name in in_scope:
        if name not in bands:
            print(f"FAIL {name}: band entry in scope but absent from "
                  f"{'missing sidecar' if not bands else 'sidecar'} {band_path} "
                  f"— rerun Verify over the band entries")
            n_fail += 1
    for name, b in sorted(bands.items()):
        if only and name not in only:
            continue
        if b.get("band_pass"):
            print(f"PASS {name} (band: {b['check']} = {b['worst']} <= {b['bound']})")
            n_pass += 1
        else:
            print(f"FAIL {name}: band violated: {b['check']} = {b['worst']} > {b['bound']}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
