"""Credit-aware single-shot capture.

The shared host behaves like a burst-credit VM: the first run after an
idle stretch is consistently 2-4x faster than back-to-back reruns
(memory: axon-tpu-quirks). This tool encodes the measurement rule:
wait until the host is genuinely idle (1-min load below threshold) AND
a 50 MB native-codec probe lands under the healthy bound, take exactly
ONE measurement, and append it with its probe/load conditions to a
JSON-lines file. No averaging of depleted-credit samples.

Usage:
    python tools/quiet_capture.py --reads 1000000 \
        [--out QUIET_r04.jsonl] [--max-wait 3600] [--load 0.2]
        [--probe 0.6] [--settle 120]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def probe_seconds() -> float:
    import numpy as np

    from elprep_tpu import native

    data = np.random.randint(0, 255, 50 << 20, dtype=np.uint8).tobytes()
    native.bgzf_compress(data)  # warm
    t0 = time.perf_counter()
    native.bgzf_compress(data)
    return time.perf_counter() - t0


def load1() -> float:
    return os.getloadavg()[0]


def wait_quiet(max_wait: float, load_thresh: float, probe_thresh: float,
               settle: float) -> "dict | None":
    """Block until load stays under threshold for ``settle`` seconds and
    the codec probe is healthy. Returns the observed conditions, or
    None when max_wait expires."""
    t_end = time.time() + max_wait
    quiet_since = None
    while time.time() < t_end:
        ld = load1()
        if ld > load_thresh:
            quiet_since = None
            time.sleep(30)
            continue
        if quiet_since is None:
            quiet_since = time.time()
        if time.time() - quiet_since < settle:
            time.sleep(15)
            continue
        pr = probe_seconds()
        if pr <= probe_thresh:
            return {"load1": round(ld, 2), "probe_s": round(pr, 3)}
        quiet_since = None  # probe says busy/throttled: restart the clock
        time.sleep(60)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--out", default=os.path.join(_REPO, "QUIET_r04.jsonl"))
    ap.add_argument("--max-wait", type=float, default=3600.0)
    ap.add_argument("--load", type=float, default=0.2)
    ap.add_argument("--probe", type=float, default=0.6)
    ap.add_argument("--settle", type=float, default=120.0)
    args = ap.parse_args()

    cond = wait_quiet(args.max_wait, args.load, args.probe, args.settle)
    if cond is None:
        print("quiet_capture: no quiet window within --max-wait", flush=True)
        return 1
    env = dict(os.environ, ELPREP_TPU_PLATFORM="cpu")
    t0 = time.perf_counter()
    run = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "stress.py"),
         "--reads", str(args.reads), "--timed", "--json"],
        env=env, capture_output=True, text=True, timeout=1800)
    wall = time.perf_counter() - t0
    sample = None
    for line in reversed(run.stdout.splitlines()):
        if line.startswith("{"):
            sample = json.loads(line)
            break
    phases = [ln.strip() for ln in (run.stdout + run.stderr).splitlines()
              if "done in" in ln]
    rec = {"ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "reads": args.reads, "conditions": cond, "wall_s": round(wall, 1),
           "rc": run.returncode, "sample": sample, "phases": phases}
    with open(args.out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0 if run.returncode == 0 else run.returncode


if __name__ == "__main__":
    main()
