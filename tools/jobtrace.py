"""Job/stage trace for one query at one core count (r14 diagnosis).

Usage: SPARK_GRAFT_CPUS=N python tools/jobtrace.py <query> [runs]

Runs the query like bench.py (clearCache + build + count), with event
logging to a temp dir, then prints per-job wall time, stage count, task
count, and the dominant stage names — so 32c-vs-8c pathologies (racing
cache fills, duplicate stage runs) show up as job/stage/task-count or
per-stage-time diffs instead of guesses.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    evdir = tempfile.mkdtemp(prefix="ev_")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("jobtrace")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from weaviate_txtai_spark.plans.queries import queries

    qs = queries()
    qs["vector_count"](spark, SF_DIR).collect()
    qs["knn_topk"](spark, SF_DIR).count()

    marks = []
    for r in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} run{r}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        marks.append((t1 - t0, t2 - t1))
        print(f"# run{r}: build={t1-t0:.3f} act={t2-t1:.3f}", file=sys.stderr)
    spark.stop()

    # parse the event log
    jobs = {}       # id -> dict
    stages = {}     # id -> dict
    paths = []
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if "appstatus" not in fn:
                paths.append(os.path.join(root, fn))
    for path in sorted(paths):
        with open(path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except Exception:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    desc = e.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    jobs[jid] = {
                        "desc": desc,
                        "t0": e["Submission Time"],
                        "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    }
                elif ev == "SparkListenerJobEnd":
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
                elif ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "tasks": si["Number of Tasks"],
                        "t0": si.get("Submission Time", 0),
                        "t1": si.get("Completion Time", 0),
                    }

    print(f"=== {name} cpus={CPUS} ===")
    for jid in sorted(jobs):
        j = jobs[jid]
        if name not in j["desc"]:
            continue
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        ran = [s for s in j["stages"] if s in stages]
        ntask = sum(stages[s]["tasks"] for s in ran)
        print(
            f"job {jid:4d} {dur:7.3f}s stages_ran={len(ran):3d} "
            f"tasks={ntask:5d} desc={j['desc'][:40]}"
        )
        for s in sorted(ran, key=lambda s: stages[s]["t1"] - stages[s]["t0"],
                        reverse=True)[:4]:
            st = stages[s]
            sdur = (st["t1"] - st["t0"]) / 1000.0
            if sdur >= 0.2:
                print(f"     stage {s:4d} {sdur:7.3f}s tasks={st['tasks']:4d} "
                      f"{st['name'][:70]}")
    print(f"eventlog: {evdir}")


if __name__ == "__main__":
    main()
