"""Stage-level decomposition of the full wave loop (bench.py --engine).

VERDICT r3 item 8: the wave loop plateaus ~3 orders of magnitude below the
standalone frontier bound; this tool attributes the gap with event-log
task metrics so the 10^8-URL-wave extrapolation in BASELINE.md rests on a
measured stage breakdown instead of "fetch UDF + commit overhead by
design". Stages are bucketed by which pipeline phase owns them (matched on
the stage's callsite name), then each bucket reports wall seconds, summed
executor run seconds, python-worker-visible run time, and shuffle volume.

Usage: PYTHONPATH=/root/repo python tools/profile_wave.py [cpus] [queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_scaling import aggregate_event_log  # noqa: E402

# callsite substring -> pipeline phase. The wave loop's actions all funnel
# through a handful of driver callsites (wave.py / store.py / seen.py), so
# the stage name's first line identifies the owner.
PHASES = [
    ("fetch", "fetch UDF + persist count (run_wave fetched.count)"),
    ("seen", "bloom/exact URL-seen path"),
    ("store", "snapshot commit (parquet writes)"),
    ("politeness", "politeness schedule"),
    ("wave", "other wave-loop driver steps"),
]


def classify(stage_name: str) -> str:
    s = stage_name.lower()
    for key, _ in PHASES:
        if key in s:
            return key
    return "other"


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_ENGINE_QUERIES", "800")
    )
    os.environ.setdefault("SPARK_GRAFT_CATALOG_N", "3000")

    from price_crawler_spark.frontier.seeds import STORE_HOST
    from price_crawler_spark.frontier.wave import CrawlRun
    from price_crawler_spark.session import get_spark

    evdir = f"/tmp/spark-events-wave-{cpus}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        f"wave-prof{cpus}", cores=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    queries = [f"gpu{i:06d}" for i in range(n_queries)]
    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        run = CrawlRun(
            spark, root, queries=queries, wave_seconds=1e6,
            mega_hosts=list(STORE_HOST.values()),
        )
        waves = run.run(max_waves=10)
        n_docs = run.documents().count()
        n_urls = run.frontier().count()
        wall = time.time() - t0
    spark.stop()
    time.sleep(2)

    stages = aggregate_event_log(evdir, t0)
    buckets: dict[str, dict] = {}
    for st in stages:
        b = buckets.setdefault(
            classify(st["name"]),
            {"stages": 0, "wall_s": 0.0, "run_s": 0.0, "gc_s": 0.0,
             "sh_write_mb": 0.0, "max_task_s": 0.0},
        )
        b["stages"] += 1
        b["wall_s"] += st["wall_s"]
        b["run_s"] += st["run_s"]
        b["gc_s"] += st["gc_s"]
        b["sh_write_mb"] += st["sh_write_mb"]
        b["max_task_s"] = max(b["max_task_s"], st["max_task_s"])
    for b in buckets.values():
        for k in ("wall_s", "run_s", "gc_s", "sh_write_mb", "max_task_s"):
            b[k] = round(b[k], 2)
    top = sorted(stages, key=lambda s: -s["wall_s"])[:12]
    print(json.dumps({
        "cpus": cpus,
        "queries": n_queries,
        "waves": waves,
        "docs_fetched": n_docs,
        "frontier_urls": n_urls,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n_docs / wall, 1),
        "stage_wall_sum_s": round(sum(s["wall_s"] for s in stages), 2),
        "phase_buckets": buckets,
        "top_stages_by_wall": top,
    }, indent=1))


if __name__ == "__main__":
    main()
