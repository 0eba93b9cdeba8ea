"""Merge scaling_run JSON artifacts into BENCH/scaling.json and report
steal-aware pairings.

Usage: python tools/scaling_consolidate.py [run.json ...]

Each input is a tools/scaling_bench.py output (its ``all_runs`` list is
what matters). The pooled store BENCH/scaling.json keeps every raw leg
ever recorded (cpus, e2e_sec, loadavg, steal_pct, source tag); this tool
appends new legs (deduplicating identical tuples) and prints, per
(a, b) level pair present in the pool:

- pooled best-of-all efficiency,
- calm-pooled efficiency (both legs from runs with steal <= threshold),
- the single best alternated ROUND efficiency (legs adjacent in time
  within one source run, the discipline BENCH/BASELINE.md headlines).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# BENCH/scaling.json keeps the historical per-sweep record; the leg pool
# (one row per raw measured leg) lives in its own file
POOL = os.path.join(REPO, "BENCH", "scaling_legs.json")
STEAL_CALM = float(os.environ.get("SCALE_STEAL_CALM", "1.0"))


def load_pool() -> list[dict]:
    if os.path.exists(POOL):
        with open(POOL) as f:
            return json.load(f)
    return []


def _meas_key(r: dict, sf) -> tuple:
    # dedup on the measurement tuple, NOT source/idx: re-consolidating the
    # same run data under a renamed/copied JSON must not double-count legs
    return (
        r.get("cpus"),
        r.get("e2e_sec"),
        r.get("loadavg"),
        r.get("steal_pct"),
        os.path.basename((sf or "sf?").rstrip("/")),
    )


def main(paths: list[str]) -> None:
    pool = load_pool()
    seen = {_meas_key(r, r.get("sf")) for r in pool}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        tag = os.path.basename(p)
        for i, r in enumerate(d.get("all_runs", [])):
            row = dict(r, source=tag, idx=i, sf=d.get("sf"))
            k = _meas_key(r, d.get("sf"))
            if k not in seen:
                seen.add(k)
                pool.append(row)
            else:
                print(f"skip duplicate leg {k} from {tag}")
    with open(POOL, "w") as f:
        json.dump(pool, f, indent=1)

    def fixture(r):
        # normalize 'fixtures/sf4' vs '/root/repo/fixtures/sf4'
        return os.path.basename((r.get("sf") or "sf?").rstrip("/"))

    def code(r):
        # legs measured under different code/config versions are not
        # comparable (e.g. the round-4 split-sizing rule changed the
        # 4-core plan but not the 1-core one): group by the git SHA the
        # leg recorded; pre-tagging legs pool under "legacy"
        return r.get("code", "legacy")

    print(f"pool: {len(pool)} legs (calm = steal <= {STEAL_CALM}%)")
    for fx, cd in sorted({(fixture(r), code(r)) for r in pool}):
        fpool = [r for r in pool if fixture(r) == fx and code(r) == cd]
        report_fixture(f"{fx} @ {cd}", fpool)


def report_fixture(fx: str, pool: list[dict]) -> None:
    levels = sorted({r["cpus"] for r in pool})
    by = {c: [r for r in pool if r["cpus"] == c] for c in levels}

    def best(rows):
        return min((r["e2e_sec"] for r in rows), default=None)

    print(f" {fx}: {len(pool)} legs, levels {levels}")
    for a in levels:
        for b in levels:
            if b / a == 4 and by.get(a) and by.get(b):
                ta, tb = best(by[a]), best(by[b])
                eff = (ta / tb) / (b / a)
                calm_a = [r for r in by[a] if r.get("steal_pct", 99) <= STEAL_CALM]
                calm_b = [r for r in by[b] if r.get("steal_pct", 99) <= STEAL_CALM]
                ceff = None
                if calm_a and calm_b:
                    ceff = (best(calm_a) / best(calm_b)) / (b / a)
                # best single alternated round: adjacent legs in one source.
                # A round only qualifies if its SMALL leg is within 15% of
                # that config's pooled best — a contended small leg inflates
                # the ratio (e.g. a 408 s 1-core outlier next to a calm
                # 4-core leg reads as 0.89 "efficiency"), which is the
                # mirror image of the contended-large-leg deflation the
                # calm gating exists to prevent. Disqualified rounds are
                # listed, not hidden.
                reff, dirty = None, []
                for src in {r.get("source") for r in pool}:
                    runs = [r for r in pool if r.get("source") == src]
                    runs.sort(key=lambda r: r.get("idx", 0))
                    for x, y in zip(runs, runs[1:]):
                        pa, pb = None, None
                        if x["cpus"] == a and y["cpus"] == b:
                            pa, pb = x, y
                        elif x["cpus"] == b and y["cpus"] == a:
                            pa, pb = y, x
                        if pa is not None:
                            e = (pa["e2e_sec"] / pb["e2e_sec"]) / (b / a)
                            if pa["e2e_sec"] > 1.15 * ta:
                                dirty.append(
                                    f"{e:.3f} (small leg {pa['e2e_sec']:.0f}s"
                                    f" = {pa['e2e_sec'] / ta:.2f}x best, inflated)"
                                )
                            else:
                                reff = e if reff is None else max(reff, e)
                print(
                    f"  {a}->{b}: pooled-best eff {eff:.3f}"
                    + (f" | calm-pooled {ceff:.3f}" if ceff is not None else " | calm-pooled n/a")
                    + (f" | best alternated round {reff:.3f}" if reff is not None else "")
                    + f"   (T{a}={ta:.1f}s T{b}={tb:.1f}s)"
                )
                for d in dirty:
                    print(f"      disqualified round: {d}")


if __name__ == "__main__":
    main(sys.argv[1:])
