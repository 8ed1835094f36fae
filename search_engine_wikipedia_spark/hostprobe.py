"""Host throttle probe shared by bench.py and jobs/scaling_bench.py.

This sandbox host throttles burst CPU credits: the SAME job can read
1.3-4× slower across a span of minutes for reasons entirely outside
the measured code (BENCH.md documents several contaminated windows,
including the uniform ~1.3-1.4× inflation across every op in
BENCH_r04.json).  Any wall-clock number taken without knowing the
window state is unadjudicable — a judge cannot distinguish "the code
got slower" from "the box got slower".

The probe is a pure-CPU spin (no Spark, no I/O): per-core increment
rate at 1 pinned thread vs N pinned threads.  A per-core ratio ≥~0.93
means N cores really deliver N cores' worth of cycles; a low ratio
means the hypervisor is stealing, and job timings taken in that window
measure the host, not our code.  Every benchmark entry point gates on
(or at minimum records) this reading so the number carries its own
provenance.
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def spin_probe(threads: int, secs: float = 3.0) -> dict:
    """Pure-CPU throttle probe: per-core spin rate at 1 thread vs
    ``threads`` concurrent processes.  A ratio ≥0.9 means the window
    is clean enough that job-scaling numbers measure OUR code, not the
    host's burst-credit throttling (this box swings 3-4× across
    minutes when credits deplete)."""

    def spin(q, dur):
        end = time.perf_counter() + dur
        n = 0
        while time.perf_counter() < end:
            for _ in range(10000):
                n += 1
        q.put(n)

    def rate(nproc):
        q = mp.Queue()
        ps = [mp.Process(target=spin, args=(q, secs)) for _ in range(nproc)]
        for pr in ps:
            pr.start()
        for pr in ps:
            pr.join()
        return sum(q.get() for _ in ps) / secs / nproc

    r1 = rate(1)
    rn = rate(threads)
    return {"threads": threads, "per_core_ratio": round(rn / r1, 3),
            "rate_1": round(r1), "rate_n": round(rn)}


def wait_for_clean_window(threads: int, min_ratio: float = 0.9,
                          max_wait: float = 1500.0) -> dict:
    """Block until the spin probe reports a clean window (per-core
    ratio ≥ ``min_ratio``) or ``max_wait`` elapses.

    Back-to-back interleaving is NOT enough on this host: a 20-minute
    full-tilt low-parallelism run drains the burst-credit bucket right
    before every high-parallelism run, systematically punishing the
    high side.  Gating each timed run on a recovered probe gives both
    sides the same starting credit state; the reading is recorded next
    to the run it gated.
    """
    t0 = time.perf_counter()
    while True:
        pr = spin_probe(threads)
        pr["waited_sec"] = round(time.perf_counter() - t0, 1)
        if pr["per_core_ratio"] >= min_ratio or pr["waited_sec"] > max_wait:
            return pr
        print(f"  throttled window (ratio {pr['per_core_ratio']}) — "
              "waiting 60s for credit refill", file=sys.stderr, flush=True)
        time.sleep(60)
