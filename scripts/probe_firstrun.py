#!/usr/bin/env python
"""Probe: where does a query's FIRST-run driver overhead go?

Phases: build (parse+analyze), physical planning (optimize+plan),
first execution (codegen compile + run), warm execution.
QueryPlanningTracker phase times printed when available.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "docs_minhash_lsh"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from modape_spark.session import get_spark

    spark = get_spark(app_name="probe-firstrun", cores=cpus,
                      shuffle_partitions=max(cpus, 8))

    import __spark_entry__ as E
    reg = E.queries()

    t0 = time.time()
    df = reg[name](spark, sf_dir)
    t1 = time.time()
    qe = df._jdf.queryExecution()
    qe.executedPlan()
    t2 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t3 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t4 = time.time()
    print(f"{name}: build={t1-t0:.2f}s plan={t2-t1:.2f}s "
          f"first_exec={t3-t2:.2f}s warm_exec={t4-t3:.2f}s")
    try:
        tr = qe.tracker()
        phases = tr.phases()
        it = phases.iterator()
        while it.hasNext():
            k = it.next()
            v = phases.get(k).get()
            print(f"  phase {k}: {(v.endTimeMs() - v.startTimeMs())/1000:.2f}s")
    except Exception as exc:
        print(f"  tracker unavailable: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
