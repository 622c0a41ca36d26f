"""Measure input-pipeline throughput (VERDICT round-2 weak #4).

Times the production loader path — PIL decode -> transform ->
batch_iterator prefetch — over a real on-disk corpus, for the
single-thread producer and the process-pool decode path, and reports
img/s next to the train-step rate it must outrun.

Usage: python tools/bench_loader.py [--root /tmp/icm_data]
       [--batch 8] [--patch 256] [--workers 0,2,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import TrainTransform  # noqa: E402
from icm_tpu.data import ImageFolder, batch_iterator  # noqa: E402


def measure(root, batch, patch, workers, n_batches=40):
    ds = ImageFolder(
        root, "train", transform=TrainTransform((patch, patch), 0)
    )
    it = batch_iterator(
        ds, batch, shuffle=True, epochs=None, workers=workers
    )
    next(it)  # warm (pool fork, page cache)
    t0 = time.time()
    n = 0
    for _ in range(n_batches):
        b = next(it)
        n += b.shape[0]
    dt = time.time() - t0
    it.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/icm_data")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--workers", default="0,2,4")
    ns = ap.parse_args()
    out = {"batch": ns.batch, "patch": ns.patch, "cores": os.cpu_count()}
    for w in (int(x) for x in ns.workers.split(",")):
        out[f"loader_img_per_s_workers{w}"] = round(
            measure(ns.root, ns.batch, ns.patch, w), 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
