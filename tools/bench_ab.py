"""Same-host A/B decomposition of the sf0.1 headline bench (round-3 VERDICT
item 1): run BENCH_PIPELINE_ONLY=1 bench.py at sf0.1 / local[32] on THIS host,
alternating the two shuffle-partition settings under dispute (fixed 64 — the
round-1/2 policy — vs 4 x cores = 128 — the round-3 policy), several legs
each, calm-window gated, with per-leg loadavg + hypervisor-steal and an event
log per leg for tools/eventlog_decompose.py.

Writes BENCH/sf01_ab.json. The point is an on-record, single-host attribution
of the round-2 -> round-3 e2e regression: host change vs shuffle policy.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scaling_bench import cpu_times, loadavg, wait_for_calm  # noqa: E402


def run_leg(shuffle: int, tag: str, cpus: int = 32) -> dict:
    ev_dir = f"/tmp/kgp-ev-ab/{tag}"
    os.makedirs(ev_dir, exist_ok=True)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        BENCH_PIPELINE_ONLY="1",
        BENCH_SHUFFLE_PARTITIONS=str(shuffle),
        KGP_EXTRA_CONF=json.dumps(
            {"spark.eventLog.enabled": "true", "spark.eventLog.dir": ev_dir}
        ),
    )
    wait_for_calm()
    load = loadavg()
    t0, s0 = cpu_times()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    t1, s1 = cpu_times()
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    return {
        "tag": tag,
        "shuffle_partitions": shuffle,
        "cpus": cpus,
        "e2e_sec": r["queries"]["kg_pipeline_e2e"],
        "n_triples": r["n_triples"],
        "loadavg_at_start": load,
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1.0), 2),
        "eventlog_dir": ev_dir,
    }


def main() -> None:
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    settings = [int(x) for x in os.environ.get("AB_SHUFFLES", "64,128").split(",")]
    legs = []
    for i in range(rounds):
        for s in settings:
            leg = run_leg(s, tag=f"r{i}_s{s}")
            legs.append(leg)
            print(json.dumps(leg), flush=True)
            # incremental write so a partial run still leaves evidence
            with open(os.path.join(REPO, "BENCH", "sf01_ab.json"), "w") as f:
                json.dump({"legs": legs}, f, indent=1)
    best = {s: min(l["e2e_sec"] for l in legs if l["shuffle_partitions"] == s)
            for s in settings}
    calm = {s: [l["e2e_sec"] for l in legs
                if l["shuffle_partitions"] == s and l["steal_pct"] <= 1.0]
            for s in settings}
    summary = {
        "legs": legs,
        "best_e2e_by_shuffle": best,
        "calm_best_by_shuffle": {s: (min(v) if v else None) for s, v in calm.items()},
    }
    with open(os.path.join(REPO, "BENCH", "sf01_ab.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "legs"}))


if __name__ == "__main__":
    main()
