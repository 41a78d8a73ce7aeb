"""Generate a deterministic sf1 benchmark dataset (10x sf0.1) under
``data/sf1`` so the headline queries measure kernels instead of the
sandbox's fixed per-stage costs (most sf0.1 queries finish in 0.3-1 s,
which is mostly JVM<->Python stage constant).

Fact tables are replicated 10x from the driver's sf0.1 parquet with
disjoint key offsets per copy, so every join/fk relationship (orders->
customer, lineitem->orders/part/supplier, events->users) stays exactly
consistent and per-key row counts match sf0.1 — aggregations and joins
scale cleanly by 10x. Documents and embeddings are SYNTHESIZED fresh
(replicating text/vectors 10x would plant 10-way exact duplicates and
turn the near-dup benchmarks into hot-bucket stress tests instead of
representative corpora): seeded zipfian word soup matching sf0.1's
vocab/length/lang/source distributions, and random unit float32 vectors.

Idempotent: skips generation when the version marker matches.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VERSION = "sf1-v1"
SCALE = 10


def _offset_copy(table: pa.Table, offsets: dict[str, int], copy: int) -> pa.Table:
    cols = {}
    for name in table.schema.names:
        col = table[name]
        if name in offsets and copy > 0:
            cols[name] = pa.chunked_array([
                pa.compute.add(col, offsets[name] * copy)])
        else:
            cols[name] = col
    return pa.table(cols)


def _replicate(src_dir: str, out_dir: str, name: str, offsets: dict[str, int]):
    t = pq.read_table(f"{src_dir}/{name}.parquet")
    parts = [_offset_copy(t, offsets, i) for i in range(SCALE)]
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet",
                   row_group_size=1 << 20)


def _synth_documents(src_dir: str, out_dir: str, rng: np.random.Generator):
    src = pq.read_table(f"{src_dir}/documents.parquet")
    n = src.num_rows * SCALE
    langs = src["lang"].to_pylist()
    sources = src["source"].to_pylist()
    vocab = np.array([f"w{i}" for i in range(4000)]
                     + ["spark", "batch", "sort", "hash", "scan", "group",
                        "agg", "filter", "query", "value", "key", "window",
                        "column", "order", "line", "fast", "slow", "small",
                        "big", "a"])
    # zipf-ish word frequencies like the sf0.1 corpus (flat head + long tail)
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    probs /= probs.sum()
    lens = rng.integers(8, 105, size=n)
    total = int(lens.sum())
    words = vocab[rng.choice(len(vocab), size=total, p=probs)]
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        "source": pa.array([sources[i % len(sources)] for i in range(n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(docs, f"{out_dir}/documents.parquet", row_group_size=1 << 16)


def _synth_embeddings(src_dir: str, out_dir: str, rng: np.random.Generator):
    src = pq.read_table(f"{src_dir}/embeddings.parquet")
    dim = len(src["embedding"][0])
    n = src.num_rows * SCALE
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n, dtype=np.int32)),
    })
    pq.write_table(emb, f"{out_dir}/embeddings.parquet", row_group_size=1 << 16)


def _src_stamp(src_dir: str) -> str:
    """Identity of the source tables (name, size, mtime): a regenerated
    sf0.1 must invalidate the derived sf1, or benches would silently
    compare against stale replicas."""
    import hashlib

    entries = []
    for f in sorted(os.listdir(src_dir)):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(src_dir, f))
            entries.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    if not entries:
        raise ValueError(f"no parquet tables in {src_dir}")
    return hashlib.sha256(";".join(entries).encode()).hexdigest()[:16]


def make_sf1(src_dir: str = "/root/testdata/sf0.1",
             out_dir: str | None = None) -> str:
    if out_dir is None:
        out_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "sf1")
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker) and not os.path.isdir(src_dir):
        return out_dir  # source gone: keep serving the built replica
    stamp = f"{VERSION}:{_src_stamp(src_dir)}"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    n_orders = pq.read_metadata(f"{src_dir}/orders.parquet").num_rows
    n_cust = pq.read_metadata(f"{src_dir}/customer.parquet").num_rows
    n_part = pq.read_metadata(f"{src_dir}/part.parquet").num_rows
    n_supp = pq.read_metadata(f"{src_dir}/supplier.parquet").num_rows
    n_events = pq.read_metadata(f"{src_dir}/events.parquet").num_rows
    ok, ck, pk, sk = n_orders * 10, n_cust * 10, n_part * 10, n_supp * 10

    _replicate(src_dir, out_dir, "lineitem",
               {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk})
    _replicate(src_dir, out_dir, "orders",
               {"o_orderkey": ok, "o_custkey": ck})
    _replicate(src_dir, out_dir, "customer", {"c_custkey": ck})
    _replicate(src_dir, out_dir, "part", {"p_partkey": pk})
    _replicate(src_dir, out_dir, "supplier", {"s_suppkey": sk})
    _replicate(src_dir, out_dir, "events",
               {"event_id": n_events * 10, "user_id": 10_000_000})
    for dim in ("region", "nation"):
        pq.write_table(pq.read_table(f"{src_dir}/{dim}.parquet"),
                       f"{out_dir}/{dim}.parquet")
    rng = np.random.default_rng(0x5F1)
    _synth_documents(src_dir, out_dir, rng)
    _synth_embeddings(src_dir, out_dir, rng)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


if __name__ == "__main__":
    out = make_sf1(*(sys.argv[1:] or []))
    print(out)
