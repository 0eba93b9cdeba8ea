"""Sample driver-side Python + JVM stacks while the e2e pipeline runs.

The event-log decomposition (tools/eventlog_decompose.py) locates
driver-only gaps — wall windows where no Spark stage is running — but
cannot say WHAT the driver is doing in them. This probe runs the same
pipeline-only bench body and, from a daemon thread, dumps every Python
thread's stack (``sys._current_frames``) every ``KGP_PROBE_SEC`` (3 s)
to ``/tmp/kgp_pystacks.log``; pair it with an external ``jstack`` loop
on the JVM pid (printed at startup) to see the Catalyst/Py4J side.

Usage (matches a scaling leg):
    SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SF_DIR=fixtures/sf16 \
        taskset -c 0-3 python tools/gap_probe.py
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sampler(out_path: str, period: float, stop: threading.Event) -> None:
    with open(out_path, "w") as f:
        while not stop.is_set():
            f.write(f"==== t={time.time():.1f} ====\n")
            for tid, frame in sys._current_frames().items():
                f.write(f"-- thread {tid}\n")
                f.write("".join(traceback.format_stack(frame)[-6:]))
            f.flush()
            stop.wait(period)


def main() -> None:
    import __spark_entry__ as entry
    from kgp.entry_support import ensure_fixtures
    from kgp.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, "fixtures", "sf4"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    ensure_fixtures(sf_dir)
    n_shuffle = min(max(4 * int(cpus), 8), 64)
    spark = get_spark("kgp-gap-probe", master=f"local[{cpus}]", shuffle_partitions=n_shuffle)
    print(f"PYTHON_PID={os.getpid()}", flush=True)

    stop = threading.Event()
    t = threading.Thread(
        target=sampler,
        args=("/tmp/kgp_pystacks.log", float(os.environ.get("KGP_PROBE_SEC", "3")), stop),
        daemon=True,
    )
    t.start()

    t0 = time.time()
    outs = entry._pipeline_outputs(spark, sf_dir)
    n = outs["triples"].count()
    outs["edges"].count()
    print(f"e2e={time.time() - t0:.1f}s triples={n}", flush=True)
    stop.set()
    spark.stop()


if __name__ == "__main__":
    main()
