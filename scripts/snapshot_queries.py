#!/usr/bin/env python
"""Snapshot every declared query's output (schema + value hash) so a
refactor can prove result-identity: run before and after, diff the JSON.

Usage: python scripts/snapshot_queries.py OUT.json [SF_DIR]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    import __spark_entry__ as e
    from modape_spark.session import get_spark

    spark = get_spark(app_name="snapshot-queries")
    qs = e.queries()
    snap = {}
    for name in sorted(qs):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            schema = df.schema.simpleString()
            rows = sorted(repr(tuple(r)) for r in df.collect())
            h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
            snap[name] = {"schema": schema, "n": len(rows), "hash": h,
                          "sec": round(time.time() - t0, 2)}
            print(f"{name}: n={len(rows)} {h[:12]} ({snap[name]['sec']}s)",
                  flush=True)
        except Exception as exc:
            snap[name] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"{name}: ERROR {snap[name]['error'][:120]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
