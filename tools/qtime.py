"""Per-query isolation timer for optimization work (guide §1): times the
named queries through the noop sink (same methodology as bench.py — full
plan execution, min over interleaved passes) and optionally dumps
``explain("formatted")`` to a file per query.

Usage:
    python tools/qtime.py [--sf SF_DIR] [--runs N] [--plans OUT_DIR] q1 q2 ...

This is an iteration tool, not the bench of record; BENCH numbers still
come from bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_medical_analysis_spark import registry  # noqa: E402
from big_data_medical_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt formatted plans")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan filenames, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("qtime")
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = registry.queries()
    # warm-up: JVM/codegen + Python worker pool (mirrors bench.py)
    qs["pricing_summary"](spark, args.sf).write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x * 1.0

    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4).repartition(n).select(
        _warm(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.queries:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)

    samples: dict[str, list[float]] = {q: [] for q in args.queries}
    counts: dict[str, tuple[int, int, int]] = {}
    sc = spark.sparkContext
    tracker = sc._jsc.sc().statusTracker()
    for run in range(args.runs):
        for name in args.queries:
            group = f"qtime-{name}-{run}"
            sc.setJobGroup(group, f"qtime:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.time() - t0)
            if run == args.runs - 1:
                jids = list(tracker.getJobIdsForGroup(group))
                n_stages = n_tasks = 0
                for j in jids:
                    ji = tracker.getJobInfo(j)
                    if ji.isEmpty():
                        continue
                    for sid in list(ji.get().stageIds()):
                        si = tracker.getStageInfo(sid)
                        if si.isEmpty():
                            continue
                        n_stages += 1
                        n_tasks += si.get().numTasks()
                counts[name] = (len(jids), n_stages, n_tasks)
            sc.setJobGroup(None, None)
    for name, v in samples.items():
        j, st, tk = counts.get(name, (0, 0, 0))
        print(
            f"{min(v):8.3f}  spread {max(v) - min(v):7.3f}  "
            f"jobs {j:3d} stages {st:4d} tasks {tk:5d}  {name}  "
            f"[{', '.join(f'{x:.2f}' for x in v)}]"
        )
    print(f"total(min): {sum(min(v) for v in samples.values()):.3f}")


if __name__ == "__main__":
    main()
