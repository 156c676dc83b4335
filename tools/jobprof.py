"""Per-job profile of one registered query: runs it once through the noop
sink with the Spark event log enabled, then prints every job's wall time,
stage count, task count and description — the breakdown that says WHERE a
many-job (checkpoint/AQE-heavy) query spends its time.

Usage: python tools/jobprof.py <query> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_medical_analysis_spark import registry  # noqa: E402
from big_data_medical_analysis_spark.session import get_spark  # noqa: E402

LOGDIR = "/tmp/spark-events-jobprof"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(LOGDIR, exist_ok=True)
    for f in glob.glob(os.path.join(LOGDIR, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    spark = get_spark(
        "jobprof",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOGDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = registry.queries()
    # warm-up
    qs["pricing_summary"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    t_build = time.time() - t0
    df.write.mode("overwrite").format("noop").save()
    t_total = time.time() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, int] = {}
    paths = []
    for p in glob.glob(os.path.join(LOGDIR, "*")):
        paths.extend(
            glob.glob(os.path.join(p, "*")) if os.path.isdir(p) else [p]
        )
    for path in paths:
        if not os.path.isfile(path):
            continue
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "stages": len(ev.get("Stage Infos", [])),
                        "tasks": sum(
                            s.get("Number of Tasks", 0)
                            for s in ev.get("Stage Infos", [])
                        ),
                        "desc": props.get(
                            "spark.job.description",
                            props.get("callSite.short", ""),
                        )[:110],
                    }
                elif k == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
    print(f"build {t_build:.2f}s  total {t_total:.2f}s  jobs {len(jobs)}")
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        gap = 0.0 if prev_end is None else (j["start"] - prev_end) / 1000.0
        prev_end = j.get("end", j["start"])
        print(
            f"job {jid:3d}  {dur:7.3f}s  gap {gap:6.3f}s  "
            f"stages {j['stages']:3d} tasks {j['tasks']:4d}  {j['desc']}"
        )


if __name__ == "__main__":
    main()
