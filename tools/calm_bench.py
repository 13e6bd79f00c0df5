"""Wait for a calm hypervisor window, then run the final benchmarks.

Loops: probe steal under load (tools/steal_probe.py, ~10 s) every
--interval seconds; when steal_frac < --threshold, run `python bench.py
--scaling` and then `python bench.py`, writing results + the probe
readings to --out-dir.  Exits after one calm-window capture or when
--deadline-min elapses (writes whatever it saw either way).

Usage (from the repo root):
    python tools/calm_bench.py --out-dir /tmp/calm --deadline-min 240
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from steal_probe import measure  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cmd(args: list[str], out_path: str, log_path: str) -> bool:
    with open(out_path, "w") as out, open(log_path, "w") as log:
        rc = subprocess.run([sys.executable] + args, stdout=out,
                            stderr=log, cwd=REPO).returncode
    return rc == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/calm_bench")
    ap.add_argument("--threshold", type=float, default=0.05)
    ap.add_argument("--interval", type=float, default=240)
    ap.add_argument("--deadline-min", type=float, default=240)
    a = ap.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)
    hist_path = os.path.join(a.out_dir, "probes.jsonl")
    t_end = time.time() + a.deadline_min * 60
    while time.time() < t_end:
        p = measure(seconds=8.0, nproc=32)
        p["ts"] = time.strftime("%H:%M:%S")
        with open(hist_path, "a") as f:
            f.write(json.dumps(p) + "\n")
        if p["steal_frac"] < a.threshold:
            ok_s = run_cmd(["bench.py", "--scaling"],
                           os.path.join(a.out_dir, "scaling.json"),
                           os.path.join(a.out_dir, "scaling.log"))
            ok_b = run_cmd(["bench.py"],
                           os.path.join(a.out_dir, "bench.json"),
                           os.path.join(a.out_dir, "bench.log"))
            with open(os.path.join(a.out_dir, "DONE"), "w") as f:
                f.write(json.dumps({"trigger_probe": p,
                                    "scaling_ok": ok_s, "bench_ok": ok_b}))
            return
        time.sleep(a.interval)
    with open(os.path.join(a.out_dir, "DEADLINE"), "w") as f:
        f.write("no calm window\n")


if __name__ == "__main__":
    main()
