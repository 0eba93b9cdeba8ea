"""Decompose a Spark event log into the scaling cost model's terms.

    T_N  =  driver_gaps  +  sum(task_time)/N  +  tail

Reads one application event log (JSON lines) and prints:
- wall (first job submit -> last job end),
- sum of task durations (core-seconds), and executor CPU inside tasks,
- driver-only gap time: wall minutes the union of stage intervals does
  not cover (Catalyst analysis, job scheduling, Py4J round trips),
- per-stage task counts (scheduling granularity vs core count).

Usage:
    KGP_EXTRA_CONF='{"spark.eventLog.enabled":"true","spark.eventLog.dir":"/tmp/kgp-ev"}' \
        taskset -c 0-3 python bench.py   # then
    python tools/eventlog_decompose.py /tmp/kgp-ev/<app-id>
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    import glob
    import os

    if os.path.isdir(path):
        # Spark 4 rolling event-log dir: events_*_<app> files in order
        parts = sorted(glob.glob(os.path.join(path, "events_*"))) or sorted(
            glob.glob(os.path.join(path, "*"))
        )
        path = parts  # list of files
    else:
        path = [path]
    stages = {}  # (stageId, attempt) -> [submit, complete]
    task_ms = 0.0
    cpu_ns = 0.0
    gc_ms = 0.0
    task_counts: dict[int, int] = {}
    stage_task_ms: dict[int, float] = {}  # per-stage task wall (run time)
    job_window = [None, None]
    app_window = [None, None]
    def lines():
        for p in path:
            if p.endswith(".zstd"):
                import io

                try:
                    import zstandard

                    with open(p, "rb") as f:
                        r = zstandard.ZstdDecompressor().stream_reader(f)
                        yield from io.TextIOWrapper(r, encoding="utf-8")
                except ModuleNotFoundError:
                    # no python-zstandard in this env; pyarrow streams it
                    import pyarrow as pa

                    with pa.input_stream(p, compression="zstd") as r:
                        yield from io.TextIOWrapper(
                            io.BytesIO(r.read()), encoding="utf-8"
                        )
            elif p.endswith(("appstatus", "inprogress")) or "appstatus" in p:
                continue
            else:
                with open(p) as f:
                    yield from f

    for line in lines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_window[0] = e.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                app_window[1] = e.get("Timestamp")
            elif ev == "SparkListenerJobStart":
                t = e.get("Submission Time")
                if t and (job_window[0] is None or t < job_window[0]):
                    job_window[0] = t
            elif ev == "SparkListenerJobEnd":
                t = e.get("Completion Time")
                if t and (job_window[1] is None or t > job_window[1]):
                    job_window[1] = t
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    stages[key] = [sub, comp]
            elif ev == "SparkListenerTaskEnd":
                ti = e.get("Task Info", {})
                task_ms += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) or 0
                tm = e.get("Task Metrics") or {}
                cpu_ns += tm.get("Executor CPU Time", 0) or 0
                gc_ms += tm.get("JVM GC Time", 0) or 0
                sid = e.get("Stage ID")
                task_counts[sid] = task_counts.get(sid, 0) + 1
                stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + (
                    tm.get("Executor Run Time", 0) or 0
                )

    if not stages or job_window[0] is None:
        print("no stages/jobs in log")
        return
    ivs = sorted(stages.values())
    merged = [list(ivs[0])]
    for s, c in ivs[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], c)
        else:
            merged.append([s, c])
    covered = sum(c - s for s, c in merged) / 1000.0
    wall = (job_window[1] - job_window[0]) / 1000.0
    # locate the gaps, not just total them: the largest driver-only holes
    # between consecutive merged stage intervals, with the stage ids that
    # bound each hole (what finished before, what the driver launched
    # after) — this is what turns "12.8% gaps" into a fixable line of code
    gaps = []
    for (s0, c0), (s1, c1) in zip(merged, merged[1:]):
        before = [k for k, iv in stages.items() if iv[1] == c0]
        after = [k for k, iv in stages.items() if iv[0] == s1]
        gaps.append(((s1 - c0) / 1000.0, before[:3], after[:3]))
    gaps.sort(reverse=True)
    # app wall includes the driver-only time BEFORE the first job submit
    # (session build, Catalyst analysis of the first query) that the
    # job-span window hides — report both so the serial floor is honest
    if app_window[0] is not None and app_window[1] is not None:
        app_wall = (app_window[1] - app_window[0]) / 1000.0
        pre = (job_window[0] - app_window[0]) / 1000.0
        print(f"app wall (ApplicationStart -> End): {app_wall:.1f} s"
              f"   pre-first-job driver time: {pre:.1f} s")
    print(f"wall (first submit -> last job end): {wall:.1f} s")
    print(f"stage-covered time: {covered:.1f} s   driver-only gaps: {wall - covered:.1f} s")
    if gaps:
        print("largest gaps (s, stage finishing before -> stage starting after):")
        for g, before, after in gaps[:10]:
            if g < 0.2:
                break
            print(f"  {g:6.1f} s  after {before} -> before {after}")
    print(f"sum task time: {task_ms / 1000.0:.1f} core-s   executor CPU in tasks: {cpu_ns / 1e9:.1f} core-s")
    print(f"GC inside tasks: {gc_ms / 1000.0:.1f} s ({gc_ms / max(task_ms, 1) * 100:.1f}% of task wall)")
    small = sorted(task_counts.items())
    print(f"stages: {len(task_counts)}   tasks: {sum(task_counts.values())}")
    ones = [sid for sid, n in small if n == 1]
    print(f"single-task stages: {len(ones)} {ones[:20]}")
    # Packing: per stage, task-wall core-seconds / (cores x stage window).
    # <1 means scheduled cores sat idle inside the stage's own window —
    # the task-count-granularity tail (e.g. 9 tasks on 4 cores = 2.25
    # waves) that found the round-4 sf16 split-sizing fix. Needs the core
    # count the leg was pinned to; pass it as argv[2].
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if cores:
        print(f"packing (task-wall / {cores} cores x stage window), heaviest stages:")
        heavy = sorted(stage_task_ms.items(), key=lambda kv: -kv[1])[:8]
        for sid, tw in heavy:
            iv = stages.get((sid, 0))
            if not iv:
                continue
            el = (iv[1] - iv[0]) / 1000.0
            pk = tw / 1000.0 / (cores * el) if el > 0 else float("nan")
            print(
                f"  stage {sid:4d}: taskwall {tw / 1e3:7.1f} s  window {el:7.1f} s"
                f"  tasks {task_counts.get(sid, 0):4d}  packing {pk:.2f}"
            )


if __name__ == "__main__":
    main(sys.argv[1])
