"""Run bench.py only when the host probes read healthy: each attempt
polls the probes every 30 s for up to 20 minutes and benches as soon
as they clear (or, after 40 unhealthy polls, proceeds anyway with an
explicit warning — the r11 host oscillates between healthy and
hypervisor-throttled, and the burst canary, DRAM bandwidth and
SUSTAINED multicore cap all move independently, so an unguarded
capture is a coin flip). Each attempt's probes ride the saved line
regardless, so even a degraded capture self-identifies.

Usage: python tools/bench_when_healthy.py [attempts] [out_prefix]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def probes() -> dict:
    import numpy as np

    a = np.random.default_rng(0).standard_normal((512, 512))
    t0 = time.perf_counter()
    for _ in range(20):
        a = a @ a * 1e-3
    calib = (time.perf_counter() - t0) * 1000
    import threading

    def work() -> None:
        x = np.random.default_rng(1).standard_normal((512, 512))
        for _ in range(20):
            x = x @ x * 1e-3

    th = [threading.Thread(target=work) for _ in range(8)]
    t0 = time.perf_counter()
    for t in th:
        t.start()
    for t in th:
        t.join()
    mcore = (time.perf_counter() - t0) * 1000
    return {"calib_ms": round(calib, 1), "mcore_ms": round(mcore, 1)}


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_healthy"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = None
    for i in range(attempts):
        # wait (up to 20 min per attempt) for a healthy window
        for _ in range(40):
            p = probes()
            healthy = p["calib_ms"] < 80 and p["mcore_ms"] < 250
            print(f"attempt {i}: {p} healthy={healthy}", flush=True)
            if healthy:
                break
            time.sleep(30)
        else:
            print(
                f"attempt {i}: proceeding DESPITE unhealthy probes "
                "(20-min wait exhausted) — discount this capture",
                flush=True,
            )
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        out = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            capture_output=True, text=True, env=env, timeout=900,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print("attempt produced no line", out.stderr[-500:], flush=True)
            continue
        obj = json.loads(line[-1])
        with open(f"{prefix}_{i}.json", "w") as f:
            f.write(line[-1])
        print(f"attempt {i}: total={obj['value']} calib={obj['calib_ms']} "
              f"mcore={obj.get('mcore_ms')} membw={obj['membw_s_per_gb']}", flush=True)
        score = obj["value"]
        if best is None or score < best[0]:
            best = (score, i)
    if best:
        print(f"BEST attempt {best[1]}: {best[0]} s -> {prefix}_{best[1]}.json", flush=True)


if __name__ == "__main__":
    main()
