#!/usr/bin/env python
"""Local stand-in for the driver's correctness pass: run every
queries()[name](sf_dir) and compare with oracle_sql()[name] via DuckDB
(row count + column names + order-insensitive value hash)."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _install_empty_schema_filter() -> None:
    """Silence Ray's schema-drift warning ONLY for the empty-partition
    artifact (the bench.py filter): a 0-row map output loses its schema
    inside Ray's MapOperator (observed through ray 2.49) even when the
    fn returns a typed empty table, so any tiny-key hash exchange logs
    one spurious '... new schema: .' line per empty partition. REAL
    drift — a non-empty differing schema — still logs."""
    import logging

    class _F(logging.Filter):
        def filter(self, rec: logging.LogRecord) -> bool:
            msg = rec.getMessage()
            return not ("different schema" in msg
                        and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import duckdb
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _install_empty_schema_filter()
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if args.only and name not in args.only:
            continue
        try:
            df = to_pandas(fn(args.sf_dir))
            if name not in oracles:
                results[name] = {"status": "rows_only", "rows": len(df)}
                print(f"{name:28s} rows_only rows={len(df)}")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            ok_rows = len(df) == len(odf)
            ok_cols = sorted(df.columns) == sorted(odf.columns)
            h1, h2 = value_hash(df), value_hash(odf)
            ok = ok_rows and ok_cols and h1 == h2
            results[name] = {
                "status": "match" if ok else "MISMATCH",
                "rows": len(df), "oracle_rows": len(odf),
                "cols_ok": ok_cols, "hash_ok": h1 == h2,
            }
            print(f"{name:28s} {'OK' if ok else 'MISMATCH'} "
                  f"rows={len(df)}/{len(odf)} cols_ok={ok_cols} hash_ok={h1==h2}")
            if not ok:
                print("  ray cols:", sorted(df.columns))
                print("  sql cols:", sorted(odf.columns))
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": str(e)[:500]}
            print(f"{name:28s} ERROR {str(e)[:300]}")
    ray.shutdown()
    bad = [k for k, v in results.items() if v["status"] in ("MISMATCH", "ERROR")]
    print(json.dumps({"bad": bad, "n": len(results)}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
