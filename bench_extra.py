"""Per-query isolation bench (guide §1.4): times individual declared
queries against the noop sink and captures .explain("formatted") plans.

bench.py is frozen for driver measurement; this file exists so the
optimization loop can re-measure one query in seconds instead of running
the full 50-minute artifact.  Usage:

    python bench_extra.py simhash repetition_metrics      # time + plans
    python bench_extra.py --all                           # every query
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py ...

Prints one JSON line {"queries": {name: [wall1, wall2]}, ...} and writes
plans to plans/r06/<name>_current.txt.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
PLAN_DIR = os.environ.get("BENCH_EXTRA_PLAN_DIR", "plans/r06")


def main() -> None:
    import __spark_entry__ as entry_mod

    from bench import _warm_datasource, fresh_session
    from sparrow_ipc_spark.plans import audit

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    all_q = entry_mod.queries()
    if "--all" in sys.argv:
        names = list(all_q)
    spark = fresh_session(f"local[{CPUS}]", CPUS)
    try:
        _warm_datasource(spark)
    except Exception:
        pass
    os.makedirs(PLAN_DIR, exist_ok=True)
    out: dict[str, list[float]] = {}
    exchanges: dict[str, int] = {}
    for name in names:
        fn = all_q[name]
        walls = []
        df = None
        for _ in range(REPS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                df.count()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        try:
            exchanges[name] = audit.count_exchanges(df)
        except Exception:
            exchanges[name] = -1
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{PLAN_DIR}/{name}_current.txt", "w") as f:
                f.write(buf.getvalue())
        except Exception:
            pass
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "queries": out,
                      "exchanges": exchanges}))


if __name__ == "__main__":
    main()
