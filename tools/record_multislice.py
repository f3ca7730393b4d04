"""Record the multi-slice dry run as a round artifact (VERDICT r3 item 6:
MULTISLICE_r{N}.json next to the driver's MULTICHIP_r{N}.json).

Runs `__graft_entry__.dryrun_multislice(n_devices, n_slices)` in a clean
CPU subprocess (the hybrid DCN x ICI mesh over virtual devices) and writes
the same-shaped json the driver records for dryrun_multichip.

Run: python tools/record_multislice.py [--round 4] [--devices 8 --slices 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--slices", type=int, default=2)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{args.devices}").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"),
         "--multislice", str(args.devices), str(args.slices)],
        cwd=repo, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1200)
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:]) + "\n"
    record = {
        "n_devices": args.devices,
        "n_slices": args.slices,
        "rc": proc.returncode,
        "ok": proc.returncode == 0 and "OK" in proc.stdout,
        "tail": tail,
    }
    out = os.path.join(repo, f"MULTISLICE_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(proc.stdout)
    print("wrote", out, "->", {k: record[k] for k in ("rc", "ok")})
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()
