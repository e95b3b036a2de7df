"""Capture .explain("formatted") for named queries into
plans/$PLANS_ROUND/ (default r13).

Usage: python capture_plans.py before|after q1,q2,...
Writes plans/<round>/<query>_<tag>.txt (judge-checkable plan evidence).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pystreams_spark.queries import QUERIES
    from pystreams_spark.session import get_spark

    spark = get_spark(app_name="plan-capture", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        n_py = (
            txt.count("ArrowEvalPython")
            + txt.count("BatchEvalPython")
            + txt.count("MapInPandas")
            + txt.count("FlatMapGroupsInPandas")
        )
        print(f"{name}: {len(txt)} chars, Exchange={n_ex}, PythonNodes={n_py} -> {path}")


if __name__ == "__main__":
    main()
