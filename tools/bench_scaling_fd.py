"""Two-cluster-size scaling benchmark for the Frequent Directions family
(BASELINE.json north_rule protocol, same shape as tools/bench_scaling.py).

Sketches the covariance of a synthetic embedding table — rows of
``label:int, emb:array<float>`` — through the standard partial→merge
harness (Arrow flat-buffer fabric) at local[N] and local[4N], reports
embeddings/sec at both plus scaling efficiency, and writes
BENCH/scaling_fd_latest.json (BASELINE.md is hand-maintained).

The input table regenerates itself deterministically if missing
(data/scaling_emb: 4M x 64 float32 across 32 files, ~1 GB), so the same
bytes feed both parallelism levels.

Usage: python tools/bench_scaling_fd.py [n_rows] [N] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DIM = 64
N_LABELS = 20
N_FILES = 32

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from zetasketch_spark.session import get_spark
from zetasketch_spark.operators.agg import sketch_merge, sketch_partial
from zetasketch_spark.sketches.freqdirs import FreqDirsFamily

cpus = {cpus}
spark = get_spark(app=f"scaling-fd-{{cpus}}", cpus=cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
fam = FreqDirsFamily(ell=16)
times = []
for trial in range({trials} + 1):
    t0 = time.time()
    df = spark.read.parquet({tdir!r})
    merged = sketch_merge(sketch_partial(df, ["label"], "emb", fam),
                          ["label"], fam, tree_levels=2)
    n_groups = merged.count()
    times.append(time.time() - t0)
best = min(times[1:])  # drop warm-up
print("RESULT " + json.dumps({{"cpus": cpus, "best_sec": best,
                              "all_sec": times, "groups": n_groups}}))
spark.stop()
"""


def ensure_table(tdir: str, n_rows: int) -> None:
    if os.path.isdir(tdir) and len(os.listdir(tdir)) >= N_FILES:
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tdir, exist_ok=True)
    per = n_rows // N_FILES
    for i in range(N_FILES):
        rng = np.random.default_rng(1000 + i)
        flat = (rng.standard_normal(per * DIM, dtype=np.float32)
                * np.tile(np.linspace(2.0, 0.1, DIM,
                                      dtype=np.float32), per))
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat), DIM) \
                .cast(pa.list_(pa.float32()))
        labels = pa.array((rng.integers(0, N_LABELS, size=per))
                          .astype(np.int32))
        pq.write_table(pa.table({"label": labels, "emb": emb}),
                       os.path.join(tdir, f"part-{i:05d}.parquet"))
    print(f"generated {n_rows} x {DIM} embeddings in {tdir}")


def run_level(cpus: int, tdir: str, trials: int) -> dict:
    code = RUNNER.format(repo=REPO, cpus=cpus, trials=trials, tdir=tdir)
    # pin BLAS to one thread per worker: the SVD in the partial stage
    # must not silently use extra cores at local[N], or the low-level
    # throughput is inflated and measured scaling efficiency is bogus
    env = dict(os.environ, OPENBLAS_NUM_THREADS="1", OMP_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, cwd=REPO, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 144_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # key the table dir by size: ensure_table only counts files, so a
    # same-named dir from a smaller run would silently feed short input
    tdir = os.path.join(REPO, "data", f"scaling_emb_{n_rows}")
    ensure_table(tdir, n_rows)
    t0 = time.time()
    lo = run_level(n, tdir, trials)
    hi = run_level(4 * n, tdir, trials)
    tp_lo = n_rows / lo["best_sec"]
    tp_hi = n_rows / hi["best_sec"]
    eff = (tp_hi / tp_lo) / 4.0
    rec = {
        "family": "freqdirs", "ell": 16, "dim": DIM, "rows": n_rows,
        "n_labels": N_LABELS,
        "low": lo, "high": hi,
        "rows_per_sec_low": round(tp_lo),
        "rows_per_sec_high": round(tp_hi),
        "scaling_efficiency": round(eff, 3),
        "wall_sec": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_fd_latest.json"),
              "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
