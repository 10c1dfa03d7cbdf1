#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: times individual declared queries into
the noop sink (guide §1.4), best-of-N with per-attempt interleaving, and
dumps `.explain("formatted")` plans to plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py --queries events_theil_sen,doc_decontaminate \
      --sf-dir /root/testdata/sf1.0 --attempts 3 --explain-tag before
  python bench_extra.py --pipeline --sf-dir /root/testdata/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _build(cores: int):
    from cardinalhq_otel_collector_spark.session import build_spark

    return build_spark(
        app_name=f"bench-extra-local{cores}",
        cores=cores,
        shuffle_partitions=max(8, 2 * cores),
        driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )


def time_queries(spark, sf_dir: str, names: list[str], attempts: int,
                 explain_tag: str | None) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, list[float]] = {n: [] for n in names}
    if explain_tag:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(REPO, "plans", "r06",
                                   f"{name}_{explain_tag}.txt"), "w") as f:
                f.write(plan)
    for _ in range(attempts):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    return {n: {"best": min(v), "samples": v} for n, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--explain-tag", default=None)
    args = ap.parse_args()

    names = [q for q in args.queries.split(",") if q]
    spark = _build(args.cores)
    try:
        res = time_queries(spark, args.sf_dir, names, args.attempts,
                           args.explain_tag)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cores": args.cores,
                      "results": res}))


if __name__ == "__main__":
    main()
