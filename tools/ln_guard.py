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
# arithmetic exactly (see the cited queries).
ARG_SQL = {
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
    srcs = {t: table_src(sf_dir, t) for t in ("documents", "nation", "customer")}
    rc = 0
    for name, sql in sorted(ARG_SQL.items()):
        q = sql.format(docs=srcs["documents"], nation=srcs["nation"],
                       customer=srcs["customer"])
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
