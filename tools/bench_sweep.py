#!/usr/bin/env python
"""Run the full round-3 measurement batch on the real chip in one go:

  1. bench.py at train batch 1 (headline JSON)
  2. bench.py at train batch 2 and 4 (MFU headroom)

Each bench.py invocation is a fresh subprocess (one jax backend per
process; the persistent compile cache makes repeats cheap).  Results are
appended as JSON lines to the --out file.

  python tools/bench_sweep.py [--out /tmp/bench_sweep.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/bench_sweep.jsonl")
    p.add_argument("--batches", default="1,2,4")
    args = p.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for tb in [int(x) for x in args.batches.split(",")]:
        env = dict(os.environ)
        env["MRCNN3D_BENCH_TRAIN_BATCH"] = str(tb)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = None
        for ln in (proc.stdout or "").strip().splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        rec = {"train_batch": tb, "wall_s": round(time.time() - t0, 1),
               "rc": proc.returncode}
        if line:
            rec["bench"] = json.loads(line)
        else:
            rec["stderr_tail"] = (proc.stderr or "")[-800:]
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
