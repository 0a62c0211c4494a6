"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage::

    python tools/dump_plans.py --suffix before --names a,b,c \
        [--sf-dir /root/testdata/sf0.1] [--tag r11]

Plans are captured WITHOUT executing the query (explain only), so this is
cheap and safe to run alongside other jobs.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from lol_data_collection_system_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="dump-plans",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    outdir = REPO / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)
    for name in args.names.split(","):
        name = name.strip()
        if not name:
            continue
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "ArrowEval"
        ) + plan.count("FlatMapGroupsInPandas") + plan.count("MapInArrow")
        print(f"{name}: {len(plan.splitlines())} lines, Exchange~{n_exch}, py-nodes~{n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
