"""Per-query structural profiler (optimization round instrumentation).

For each named query: wall time (noop sink, warm), number of Spark jobs,
number of stages and tasks, and total shuffle read/write bytes — the
"plan shape" numbers the optimization guide (§1) says to capture before
changing anything. Uses the status tracker's job-group API, so it needs
no UI and no listener jar.

Usage:  python profile_queries.py q1,q2,...   (default: all registered)
Output: one JSON line per query to stdout + /tmp/profile_queries.json
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pystreams_spark.queries import QUERIES
    from pystreams_spark.session import get_spark

    spark = get_spark(app_name="pystreams-profile", cpus=cpus)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    names = list(QUERIES)
    if len(sys.argv) > 1 and sys.argv[1].strip():
        names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    # warm the session the same way bench.py does
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    from pystreams_spark.io import ensure_parallelism, load_table

    ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        F.pandas_udf(lambda s: s, "string")(F.col("text")).alias("t")
    ).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    out = []
    import gc

    for name in names:
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        rec = {
            "query": name,
            "wall": wall,
            "n_jobs": len(job_ids),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        gc.collect()

    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)
    total = round(sum(r["wall"] for r in out), 2)
    jobs = sum(r["n_jobs"] for r in out)
    print(
        json.dumps({"total_wall": total, "total_jobs": jobs, "n": len(out)}),
        flush=True,
    )


if __name__ == "__main__":
    main()
