"""Stage-level profile of a Spark event log (rolling, zstd) — the tool
behind BENCH/BASELINE.md's round-4 scaling-efficiency diagnosis.

Enable logging for any bench arm via a throwaway conf dir:

    mkdir -p /tmp/sparkconf /tmp/sparkevents
    printf 'spark.eventLog.enabled true\nspark.eventLog.dir file:///tmp/sparkevents\n' \
        > /tmp/sparkconf/spark-defaults.conf
    SPARK_CONF_DIR=/tmp/sparkconf ... python bench.py --pagerank-only

Then: python tools/stage_profile.py [n_logs]

Reports, per stage: wall, task count, summed executor run/CPU/GC time.
The number that matters for local-mode scaling studies is CPU-SUM ACROSS
CORE COUNTS for the SAME stage: if wall == cpusum/cores at both levels
(perfect packing) but cpusum itself inflates with cores, the scaling loss
is memory-subsystem contention (stalled cycles bill as CPU time), not
engine seriality — and it does not transfer to multi-executor clusters
with private DRAM.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

ZSTD = shutil.which("unzstd") or "/root/miniconda/bin/unzstd"


def read_events(logdir: str):
    for fp in sorted(glob.glob(os.path.join(logdir, "events_*"))):
        if fp.endswith(".zstd"):
            txt = subprocess.run(
                [ZSTD, "-c", fp], capture_output=True, text=True
            ).stdout
        else:
            txt = open(fp).read()
        for line in txt.splitlines():
            try:
                yield json.loads(line)
            except ValueError:
                continue


def profile(logdir: str, top: int = 10) -> None:
    stages: dict[int, dict] = {}
    execs: dict[int, dict] = {}
    for ev in read_events(logdir):
        t = ev.get("Event")
        if t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:40],
                "tasks": si["Number of Tasks"],
                "wall_ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }
        elif t == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            d = execs.setdefault(ev["Stage ID"], {"run": 0, "gc": 0, "cpu": 0.0})
            d["run"] += m.get("Executor Run Time", 0)
            d["gc"] += m.get("JVM GC Time", 0)
            d["cpu"] += m.get("Executor CPU Time", 0) / 1e6
    print("====", os.path.basename(logdir))
    for sid in sorted(stages, key=lambda s: -stages[s]["wall_ms"])[:top]:
        s, e = stages[sid], execs.get(sid, {})
        print(
            f"stage {sid:3d} wall {s['wall_ms'] / 1e3:7.2f}s tasks {s['tasks']:4d} "
            f"runsum {e.get('run', 0) / 1e3:8.1f}s cpusum {e.get('cpu', 0) / 1e3:8.1f}s "
            f"gc {e.get('gc', 0) / 1e3:6.1f}s  {s['name']}"
        )
    tot = sum(s["wall_ms"] for s in stages.values())
    print(f"total stage wall: {tot / 1e3:.1f} s over {len(stages)} stages")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dirs = sorted(
        glob.glob("/tmp/sparkevents/eventlog_v2_*"), key=os.path.getmtime
    )[-n:]
    for d in dirs:
        profile(d)
