"""One-command runner for every pending on-chip validation, in priority
order — built for short tunnel windows (the axon TPU link has been down
for ~24h; when it returns it may not stay up).

Order (highest value first — r3 verdict items 1, 2, 4, 5):
  1. bench.py                 — THE round perf artifact
  2. golden_onchip_tpu.py     — golden CLI re-pin through the s5 paths
  3. scale_device_tpu.py      — device-side any-scale validation + walls
  4. serve_bench_tpu.py       — serving requests/s + P50/P99
  5. train_wall_tpu.py        — Trainer.fit wall incl. host feed
  6. halo_overlap_tpu.py      — compiled self-ring re-check (lowest)

Each step runs as a subprocess (`python - < script`, the form the axon
plugin needs — CLAUDE.md), with its own timeout; failures don't stop
the queue.  Journal: scripts/tpu_queue_journal.json (per-step rc, wall,
output tail).  A bounded device probe runs first; if the tunnel is down
the runner exits 3 immediately.

Usage:  python scripts/tpu_queue.py [--skip-probe] [--only STEP ...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOURNAL = os.path.join(REPO, "scripts", "tpu_queue_journal.json")

PROBE = """
import time, sys
t0 = time.time()
import jax
d = jax.devices()
import numpy as np
x = jax.device_put(np.ones((8, 8), np.float32), d[0])
assert float(x.sum()) == 64.0
print(f"TPU_OK {d} {time.time()-t0:.1f}s", flush=True)
"""

STEPS = [
    # (name, command-style, path-or-None, timeout_s)
    ("bench", "plain", "bench.py", 3600),
    ("serve_bench", "stdin", "scripts/serve_bench_tpu.py", 2400),
    ("s2d_ab", "stdin", "scripts/s2d_ab_tpu.py", 3600),
    ("golden_onchip", "stdin", "scripts/golden_onchip_tpu.py", 2400),
    ("scale_device", "stdin", "scripts/scale_device_tpu.py", 3600),
    ("train_wall", "stdin", "scripts/train_wall_tpu.py", 3600),
    ("halo_overlap", "stdin", "scripts/halo_overlap_tpu.py", 2400),
    # r5 serving/quant levers: classes= pan subset + int8 bias-correct
    # throughput (writes scripts/r5_features_report.json)
    ("r5_features", "stdin", "scripts/r5_features_tpu.py", 3600),
]


def run_step(name, style, path, timeout):
    t0 = time.time()
    try:
        if style == "plain":
            p = subprocess.run([sys.executable, path], cwd=REPO,
                               capture_output=True, text=True,
                               timeout=timeout)
        else:
            with open(os.path.join(REPO, path)) as f:
                p = subprocess.run([sys.executable, "-"], stdin=f, cwd=REPO,
                                   capture_output=True, text=True,
                                   timeout=timeout)
        rc, out = p.returncode, (p.stdout + p.stderr)
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode("utf-8", "replace")
               + (e.stderr or b"").decode("utf-8", "replace"))
    return {"step": name, "rc": rc, "wall_s": round(time.time() - t0, 1),
            "tail": out[-4000:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only the named steps (in queue order)")
    ap.add_argument("--probe-timeout", type=float, default=600.0)
    args = ap.parse_args()

    journal = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "steps": []}
    if not args.skip_probe:
        print("probing TPU...", flush=True)
        try:
            p = subprocess.run([sys.executable, "-"], input=PROBE, cwd=REPO,
                               capture_output=True, text=True,
                               timeout=args.probe_timeout)
            up = "TPU_OK" in p.stdout
            journal["probe"] = p.stdout.strip()[-300:] or p.stderr[-300:]
        except subprocess.TimeoutExpired:
            up, journal["probe"] = False, "probe timeout"
        if not up:
            print(f"TPU unreachable ({journal['probe']}); exiting 3")
            with open(JOURNAL, "w") as f:
                json.dump(journal, f, indent=1)
            return 3
        print(journal["probe"], flush=True)

    for name, style, path, timeout in STEPS:
        if args.only and name not in args.only:
            continue
        print(f"== {name} (timeout {timeout}s)", flush=True)
        rec = run_step(name, style, path, timeout)
        journal["steps"].append(rec)
        print(f"   rc={rec['rc']} wall={rec['wall_s']}s", flush=True)
        with open(JOURNAL, "w") as f:  # journal survives a mid-queue death
            json.dump(journal, f, indent=1)
    bad = [s["step"] for s in journal["steps"] if s["rc"] != 0]
    print(json.dumps({"done": True, "failed_steps": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
