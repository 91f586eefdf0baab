"""Per-stage wall-vs-task-seconds table from a Spark event log.

The scaling question this answers (BENCH.md): when the same job runs at 2
and 8 executors, which stages' WALL inflates while their TASK-SECONDS stay
flat? Flat task-seconds + inflated wall = the executors did the same work
but spent longer waiting (scheduler/vCPU/DRAM contention — a box property);
growing task-seconds = the engine genuinely did more work at higher
parallelism (an engine property: e.g. more shuffle traffic, cache misses).

Usage:
    python scripts/stage_forensics.py <event-log-file-or-dir> [more logs...]

With two logs (one per parallelism level), prints a side-by-side comparison
keyed by stage name. Event logs come from
    scaling_bench.py --event-log-dir /tmp/bioner_scaling/evlogs
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _iter_lines(path: str):
    """Yield event-log JSON lines from a plain file, a .zstd file (pyarrow
    streaming codec), or a Spark-4 rolling eventlog_v2 directory."""
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.startswith("events_"):
                yield from _iter_lines(os.path.join(path, f))
        return
    if path.endswith(".zstd"):
        import io

        import pyarrow as pa

        raw = open(path, "rb").read()
        with pa.input_stream(io.BytesIO(raw), compression="zstd") as s:
            data = s.read()
        yield from io.TextIOWrapper(io.BytesIO(data), encoding="utf-8")
        return
    with open(path, encoding="utf-8") as f:
        yield from f


def parse_log(path: str) -> dict:
    """→ {app_name, executors, stages: [{id, name, wall, task_sec, gc_sec,
    shuffle_read_mb, shuffle_write_mb, spill_mb, n_tasks}]}"""
    stages: dict[int, dict] = {}
    task_metrics = defaultdict(lambda: dict(task_sec=0.0, gc_sec=0.0,
                                            sr_mb=0.0, sw_mb=0.0,
                                            spill_mb=0.0, n=0))
    app_name = "?"
    # PEAK CONCURRENT executors (Added minus Removed), not distinct ids:
    # a relaunched executor re-Adds under a FRESH id, so a distinct-id
    # count overstates the parallelism of any run that lost an executor —
    # the exact number the wall-vs-task-seconds decision rule divides by
    exec_cur = exec_peak = 0
    # retries: task seconds are summed across ALL attempts, so the wall
    # must cover all attempts too — SUM attempt walls per stage id (and
    # surface n_attempts) instead of keeping only the last attempt, or a
    # box-level retry reads as "the engine did more work per wall second"
    # and inverts the wall-vs-task-seconds decision rule this tool exists
    # to apply.
    for line in _iter_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_name = ev.get("App Name", "?")
        elif e == "SparkListenerExecutorAdded":
            exec_cur += 1
            exec_peak = max(exec_peak, exec_cur)
        elif e == "SparkListenerExecutorRemoved":
            exec_cur -= 1
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            wall = (comp - sub) / 1e3 if sub and comp else 0.0
            sid = si["Stage ID"]
            if sid in stages:
                stages[sid]["wall"] += wall
                stages[sid]["n_attempts"] += 1
            else:
                stages[sid] = dict(
                    id=sid,
                    name=si["Stage Name"].split(" at ")[0][:38],
                    wall=wall,
                    n_attempts=1,
                )
        elif e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            t = task_metrics[ev["Stage ID"]]
            t["task_sec"] += m.get("Executor Run Time", 0) / 1e3
            t["gc_sec"] += m.get("JVM GC Time", 0) / 1e3
            srm = m.get("Shuffle Read Metrics") or {}
            t["sr_mb"] += (srm.get("Local Bytes Read", 0)
                           + srm.get("Remote Bytes Read", 0)) / 1e6
            swm = m.get("Shuffle Write Metrics") or {}
            t["sw_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
            t["spill_mb"] += (m.get("Memory Bytes Spilled", 0)
                              + m.get("Disk Bytes Spilled", 0)) / 1e6
            t["n"] += 1
    out = []
    for sid, s in sorted(stages.items()):
        t = task_metrics[sid]
        out.append(dict(s, task_sec=round(t["task_sec"], 1),
                        gc_sec=round(t["gc_sec"], 1),
                        shuffle_read_mb=round(t["sr_mb"], 1),
                        shuffle_write_mb=round(t["sw_mb"], 1),
                        spill_mb=round(t["spill_mb"], 1),
                        n_tasks=t["n"], wall=round(s["wall"], 1)))
    return dict(app=app_name, executors=exec_peak, stages=out, path=path)


def collect_logs(arg: str) -> list[str]:
    if os.path.isdir(arg):
        entries = os.listdir(arg)
        if any(e.startswith("events_") for e in entries):
            return [arg]  # a single eventlog_v2 app directory
        return sorted(
            os.path.join(arg, f) for f in entries
            if not f.startswith(".") and not f.endswith(".inprogress")
            and not f.startswith("appstatus")
        )
    return [arg]


def group_by_name(stages: list[dict]) -> dict[str, dict]:
    """Aggregate repeated stages (same name) — retried/multi-job stages sum."""
    g: dict[str, dict] = {}
    for s in stages:
        a = g.setdefault(s["name"], dict(wall=0.0, task_sec=0.0, gc_sec=0.0,
                                         shuffle_mb=0.0, n=0))
        a["wall"] += s["wall"]
        a["task_sec"] += s["task_sec"]
        a["gc_sec"] += s["gc_sec"]
        a["shuffle_mb"] += s["shuffle_read_mb"] + s["shuffle_write_mb"]
        a["n"] += s["n_tasks"]
    return g


def main() -> None:
    logs = [p for a in sys.argv[1:] for p in collect_logs(a)]
    if not logs:
        sys.exit(__doc__)
    parsed = [parse_log(p) for p in logs]
    if len(parsed) == 1:
        p = parsed[0]
        print(f"# {p['app']}  executors={p['executors']}  ({p['path']})")
        print(f"{'stage':<42} {'wall_s':>7} {'task_s':>8} {'gc_s':>6} "
              f"{'shufR_MB':>9} {'shufW_MB':>9} {'spill':>6} {'tasks':>6}")
        for s in p["stages"]:
            print(f"{s['id']:>3} {s['name']:<38} {s['wall']:>7} {s['task_sec']:>8} "
                  f"{s['gc_sec']:>6} {s['shuffle_read_mb']:>9} "
                  f"{s['shuffle_write_mb']:>9} {s['spill_mb']:>6} {s['n_tasks']:>6}")
        tot_w = round(sum(s["wall"] for s in p["stages"]), 1)
        tot_t = round(sum(s["task_sec"] for s in p["stages"]), 1)
        print(f"{'TOTAL':<42} {tot_w:>7} {tot_t:>8}")
        return
    # side-by-side: first two logs, keyed by stage name
    if len(parsed) > 2:
        print(f"WARNING: {len(parsed)} event logs found; comparing only the "
              f"first two by app-id order ({parsed[0]['app']} vs "
              f"{parsed[1]['app']}) — multi-trial dirs hold several logs "
              "PER LEVEL, so pass two explicit log paths to compare levels",
              file=sys.stderr)
    a, b = parsed[0], parsed[1]
    ga, gb = group_by_name(a["stages"]), group_by_name(b["stages"])
    print(f"# A = {a['executors']} executors ({os.path.basename(a['path'])})")
    print(f"# B = {b['executors']} executors ({os.path.basename(b['path'])})")
    print(f"{'stage':<42} {'wallA':>7} {'wallB':>7} {'taskA':>8} {'taskB':>8} "
          f"{'gcA':>5} {'gcB':>5} {'shufA_MB':>9} {'shufB_MB':>9}")
    names = sorted(set(ga) | set(gb),
                   key=lambda n: -(ga.get(n, {}).get("wall", 0)
                                   + gb.get(n, {}).get("wall", 0)))
    for n in names:
        x = ga.get(n, dict(wall=0, task_sec=0, gc_sec=0, shuffle_mb=0))
        y = gb.get(n, dict(wall=0, task_sec=0, gc_sec=0, shuffle_mb=0))
        print(f"{n:<42} {x['wall']:>7.1f} {y['wall']:>7.1f} "
              f"{x['task_sec']:>8.1f} {y['task_sec']:>8.1f} "
              f"{x['gc_sec']:>5.1f} {y['gc_sec']:>5.1f} "
              f"{x['shuffle_mb']:>9.1f} {y['shuffle_mb']:>9.1f}")
    for tag, p, g in (("A", a, ga), ("B", b, gb)):
        print(f"TOTAL {tag}: wall {sum(v['wall'] for v in g.values()):.1f} s, "
              f"task {sum(v['task_sec'] for v in g.values()):.1f} s, "
              f"gc {sum(v['gc_sec'] for v in g.values()):.1f} s")


if __name__ == "__main__":
    main()
