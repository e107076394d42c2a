"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir and
compares against ``oracle_sql()`` via DuckDB: row count, schema width,
and an order-insensitive value hash (rows stringified, columns sorted
by name, rows sorted). Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")


def norm_cell(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_digest(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # The lazy oracle builders (IVF/PQ training samples, sampling
    # thresholds) read SPARK_GRAFT_ORACLE_SF_DIR; if the caller forgot
    # to export it for a non-default sf_dir the twin would derive its
    # literals from sf0.01 while Spark runs at sf_dir — every
    # sample-dependent query then "fails" as a harness artifact
    # (happened twice: round-5 solo probes, round-6 background sweep).
    # Default it to the positional arg so the two sides always agree.
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import __spark_entry__ as entrymod
    from pond_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must FAIL loudly — '0/0 pass' with exit 0 would
        # let a gate believe it checked something it never ran
        print(f"unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sh, slines = table_digest(scols, srows)
        oh, olines = table_digest(ocols, orows)
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if sh != oh:
            status.append("value-hash mismatch")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
            sset, oset = set(slines), set(olines)
            for line in list(sset - oset)[:3]:
                print(f"      spark-only: {line[:160]}")
            for line in list(oset - sset)[:3]:
                print(f"      duck-only : {line[:160]}")
        else:
            print(f"PASS {name}: rows={len(srows)} hash={sh}")
    print(f"\n{attempted - len(failures)}/{attempted} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
