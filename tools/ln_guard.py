#!/usr/bin/env python3
"""Cross-libm ln-ulp parity guard (round-10 verdict ask #2).

Three entries key on `round(ln(x) * 1e6)` with INTEGER x computed live
in both engines (q_sample_weighted per-doc hash draws, q_privacy_dp_count
per-nation Laplace draws, q_stats_mutual_info contingency counts). JVM
Math.log and DuckDB's libm are each correctly-rounded only to ~1 ulp, so
an argument whose ln(x)*1e6 lands within a few ulps of a `.5` rounding
boundary COULD round to different LONGs on the two engines and flip a
key/rank. This guard replays every such argument the entry would draw
from the given data directory and asserts none is within THRESHOLD of a
boundary — exposure grows with corpus size, so the x10/x20 certification
runs it on the inflated data (wired into tools/check_batch.sh).

Threshold: ulp(2.8e7) ~ 3.7e-9, so a 2-ulp cross-libm divergence moves
ln(x)*1e6 by < 1e-8. 1e-7 gives a 10x margin while being ~1e-7-probable
per draw (a hit is a genuine at-risk argument, not noise).

Usage: ln_guard.py <sfDir>   (exit 1 on any at-risk argument)
"""
import os
import sys

import duckdb

THRESHOLD = 1e-7

# Per-entry SQL producing one integer column `x` = every live ln argument
# that entry draws from this data directory. Must mirror the engine/oracle
# arithmetic exactly (see the cited queries). r11 extension: beyond the
# three originally-flagged entries, every OTHER round(ln(int)*1e6) site
# whose argument space grows with corpus size (token/bigram counts,
# risk-set sizes, zipf ranks/freqs) is guarded too — the hash compare
# certifies them at x10/x20, the guard covers scales beyond.
DOCS_TOKS = """
  dt AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         FROM read_parquet({docs})),
  tokens AS (SELECT doc_id, unnest(toks) AS tok FROM dt),
  sp AS (SELECT doc_id, CASE WHEN ((doc_id % 2147483648) * 40503) % 100 < 80 THEN 'train'
          WHEN ((doc_id % 2147483648) * 40503) % 100 < 90 THEN 'val' ELSE 'test' END AS split
         FROM read_parquet({docs}))
"""

ARG_SQL = {
    # LlmOps.qTextEntropy: per-(doc, tok) counts + per-doc token totals
    "q_text_entropy": "WITH" + DOCS_TOKS + """
        SELECT count(1) AS x FROM tokens GROUP BY doc_id, tok
        UNION ALL SELECT count(1) FROM tokens GROUP BY doc_id
    """,
    # CorpusOps UnigramNllSql (q_text_unigram_nll + q_text_ppl_buckets):
    # ln(cnt+1) per train token, ln(n+v) once
    "q_text_unigram_nll": "WITH" + DOCS_TOKS + """,
        tr AS (SELECT tok, count(1) AS cnt FROM tokens JOIN sp USING (doc_id)
               WHERE split = 'train' GROUP BY 1)
        SELECT cnt + 1 AS x FROM tr
        UNION ALL SELECT CAST(sum(cnt) AS BIGINT) + count(1) FROM tr
    """,
    # CorpusOps q_text_bigram_nll: ln(cbg+1) per train bigram (incl. the
    # unseen-bigram 0+1 case), ln(c1+v) per context (incl. unseen 0+v)
    "q_text_bigram_nll": "WITH" + DOCS_TOKS + """,
        bi AS (SELECT b.doc_id, toks[i] || ' ' || toks[i + 1] AS bg
               FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
                     FROM dt WHERE len(toks) >= 2) b),
        cbg AS (SELECT bg, count(1) AS cbg FROM bi JOIN sp USING (doc_id)
                WHERE split = 'train' GROUP BY 1),
        uni AS (SELECT tok, count(1) AS c1 FROM tokens JOIN sp USING (doc_id)
                WHERE split = 'train' GROUP BY 1),
        vv AS (SELECT count(1) AS v FROM uni)
        SELECT cbg + 1 AS x FROM cbg
        UNION ALL SELECT 1
        UNION ALL SELECT c1 + v FROM uni, vv
        UNION ALL SELECT v FROM vv
    """,
    # CorpusOps.qEventsSurvival: ln(n_risk) and ln(n_risk - n_churn)
    "q_events_survival": """
        WITH ch AS (SELECT datediff('day', CAST(min(CAST(ts AS TIMESTAMP)) AS DATE),
                                    CAST(max(CAST(ts AS TIMESTAMP)) AS DATE)) AS day
                    FROM read_parquet({events}) GROUP BY user_id),
        cd AS (SELECT day, count(1) AS n_churn FROM ch GROUP BY day),
        t AS (SELECT CAST(sum(n_churn) AS BIGINT) AS tot FROM cd),
        r AS (SELECT day, n_churn,
               tot - coalesce(sum(n_churn) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
              FROM cd, t)
        SELECT n_risk AS x FROM r
        UNION ALL SELECT n_risk - n_churn FROM r WHERE n_risk > n_churn
    """,
    # CorpusOps.qTextZipf: ln(rank) for 1..1000 and ln(freq) of the top-1000
    "q_text_zipf": "WITH" + DOCS_TOKS + """,
        c AS (SELECT tok, count(1) AS freq FROM tokens GROUP BY tok),
        top AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
                FROM c ORDER BY freq DESC, tok ASC LIMIT 1000)
        SELECT rank AS x FROM top UNION ALL SELECT freq FROM top
    """,
    # LlmOps.qSampleWeighted: h = 40-bit md5 prefix of doc_id + 1, one per doc
    "q_sample_weighted": """
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::UBIGINT + 1 AS BIGINT) AS x
        FROM read_parquet({docs})
    """,
    # CorpusOps.qPrivacyDpCount: m = max(1, 2^40 - 2|h - 2^39|), one per nation
    "q_privacy_dp_count": """
        SELECT greatest(1, 1099511627776 - 2 * abs(
            CAST(('0x' || substr(md5(n_name), 1, 10))::UBIGINT AS BIGINT) - 549755813888)) AS x
        FROM read_parquet({nation})
    """,
    # QualityOps.qStatsMutualInfo: lnq args = n*nij, ni, nj, n over the
    # (segment, nation) contingency cells of customer
    "q_stats_mutual_info": """
        WITH cells AS (
          SELECT c_mktsegment AS seg, n_name AS nat, count(1) AS nij
          FROM read_parquet({customer}) c JOIN read_parquet({nation}) n
            ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2),
        t AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells)
        SELECT CAST(n * nij AS BIGINT) AS x FROM cells, t
        UNION ALL SELECT CAST(sum(nij) AS BIGINT) FROM cells GROUP BY seg
        UNION ALL SELECT CAST(sum(nij) AS BIGINT) FROM cells GROUP BY nat
        UNION ALL SELECT n FROM t
    """,
}


def table_src(sf_dir: str, name: str) -> str:
    p = f"{sf_dir}/{name}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"


def main() -> int:
    sf_dir = sys.argv[1]
    con = duckdb.connect()
    # Spill hygiene, same contract as check.py (round-8 postmortem; r12:
    # extracted to tools/spill.py — one copy, start-time-marked orphan
    # sweep, no PID-recycle hazard).
    import spill as spill_mod
    spill_mod.setup_spill(con)
    srcs = {t: table_src(sf_dir, t)
            for t in ("documents", "nation", "customer", "events")}
    rc = 0
    for name, sql in sorted(ARG_SQL.items()):
        q = sql.format(docs=srcs["documents"], nation=srcs["nation"],
                       customer=srcs["customer"], events=srcs["events"])
        # distance of ln(x)*1e6 to the nearest .5 rounding boundary
        row = con.execute(f"""
            SELECT count(1), min(abs(y - floor(y) - 0.5))
            FROM (SELECT ln(CAST(x AS DOUBLE)) * 1e6 AS y FROM ({q}) WHERE x > 0)
        """).fetchone()
        n, dmin = row
        ok = dmin is None or dmin > THRESHOLD
        status = "OK" if ok else "AT-RISK"
        print(f"LNGUARD {status} {name}: {n} args, min boundary distance "
              f"{dmin if dmin is not None else 'n/a'}")
        if not ok:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
