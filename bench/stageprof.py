#!/usr/bin/env python3
"""Per-stage scaling attribution from Spark event logs.

Runs jobs/extract.py at each requested parallelism with
spark.eventLog enabled, then parses the event log into a per-stage
table (wall, summed task time, task CPU, JVM GC) so the N -> 4N gap
can be attributed to a stage instead of guessed at. Produces the
evidence BENCH/DIAGNOSIS_4_16.md cites.

Usage: python bench/stageprof.py [cores ...]   (default: 4 16)
Env: STAGEPROF_INPUT (default the scaling bench's 8M-turn table),
     STAGEPROF_ARGS  (extra jobs/extract.py args, space-separated)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
INPUT = os.environ.get(
    "STAGEPROF_INPUT", "/tmp/htmlparser_scaling/transcripts_8000000")
EXTRA = os.environ.get(
    "STAGEPROF_ARGS", "--order-impl two_phase --lineage-mode hash_col"
).split()


def run_leg(cores: int, evdir: Path) -> float:
    out = Path(f"/tmp/stageprof/out_{cores}")
    ck = Path(f"/tmp/stageprof/ck_{cores}")
    for p in (out, ck):
        if p.exists():
            shutil.rmtree(p)
    evdir.mkdir(parents=True, exist_ok=True)
    cmd = [SPARK_SUBMIT, "--master", f"local[{cores}]",
           "--driver-memory", "12g",
           "--conf", "spark.eventLog.enabled=true",
           "--conf", f"spark.eventLog.dir={evdir}",
           "--py-files", str(REPO / "htmlparser_spark.zip"),
           str(REPO / "jobs/extract.py"),
           "--input", INPUT, "--output", str(out),
           "--checkpoint", str(ck), "--run-id", f"prof-{cores}",
           *EXTRA]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=str(REPO))
    wall = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        raise SystemExit(f"leg {cores} failed")
    for ln in r.stdout.splitlines():
        if ln.startswith("extract:"):
            print(f"[{cores} cores] {ln}  (submit wall {wall:.1f}s)")
    return wall


def parse_events(evdir: Path) -> list[dict]:
    logs = sorted(evdir.glob("*"), key=lambda p: p.stat().st_mtime)
    f = logs[-1]
    if f.is_dir():  # Spark 4 rolling event log: a dir of events_* files
        def _open(p: Path):
            if p.suffix == ".zstd":
                out = subprocess.run(["zstd", "-dc", str(p)],
                                     capture_output=True, check=True)
                return out.stdout.decode().splitlines()
            return p.open()
        parts = sorted(p for p in f.glob("events_*"))
        lines = (ln for p in parts for ln in _open(p))
    else:
        lines = f.open()
    stages: dict = {}
    agg = defaultdict(lambda: {"task_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                               "n_tasks": 0})
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "stage": sid,
                "name": si["Stage Name"].split("\n")[0][:60],
                "wall_s": round((si.get("Completion Time", 0)
                                 - si.get("Submission Time", 0)) / 1e3, 1),
            }
        elif k == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            a = agg[sid]
            a["task_ms"] += m.get("Executor Run Time", 0)
            a["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
            a["gc_ms"] += m.get("JVM GC Time", 0)
            a["n_tasks"] += 1
    rows = []
    for sid in sorted(stages):
        r = {**stages[sid], **{k: round(v / 1e3, 1) if k.endswith("ms")
                               else v for k, v in agg[sid].items()}}
        r = {**stages[sid],
             "task_s": round(agg[sid]["task_ms"] / 1e3, 1),
             "cpu_s": round(agg[sid]["cpu_ms"] / 1e3, 1),
             "gc_s": round(agg[sid]["gc_ms"] / 1e3, 1),
             "n_tasks": agg[sid]["n_tasks"]}
        rows.append(r)
    return rows


def main() -> int:
    cores = [int(c) for c in (sys.argv[1:] or ["4", "16"])]
    report = {}
    for c in cores:
        evdir = Path(f"/tmp/stageprof/ev_{c}")
        if evdir.exists():
            shutil.rmtree(evdir)
        run_leg(c, evdir)
        rows = parse_events(evdir)
        report[c] = rows
        print(f"\n== local[{c}] stages ==")
        print(f"{'id':>3} {'wall_s':>7} {'task_s':>8} {'cpu_s':>8} "
              f"{'gc_s':>6} {'tasks':>5}  name")
        for r in rows:
            print(f"{r['stage']:>3} {r['wall_s']:>7} {r['task_s']:>8} "
                  f"{r['cpu_s']:>8} {r['gc_s']:>6} {r['n_tasks']:>5}  "
                  f"{r['name']}")
    Path("/tmp/stageprof/report.json").write_text(json.dumps(report,
                                                             indent=1))
    print("\nwritten /tmp/stageprof/report.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
