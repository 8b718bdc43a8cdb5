"""CPU recall experiment: leaf-ALIGNED fixed-P block probing.

Third variant (after leafprobe/blockprobe): blocks never straddle leaf
boundaries — each leaf is cut into ceil(len/P) blocks, the last one
padded.  Probe cost is uniform ([T, L] gathered P-blocks), recall
granularity is at-least-leaf-level.  Reports recall at the REAL serving
cost metric: gathered slots per query = T * L * P (padding included).

    python scripts/leafblock_experiment.py [--db /tmp/glove_1m]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

from arroy_tpu import Database, Reader
from arroy_tpu.models.forest import KIND_LEAF, KIND_SPLIT, KIND_SPLIT_NONE


def tree_leaf_arrays(forest, root):
    out, stack = [], [int(root)]
    kind, left, right = forest.kind, forest.left, forest.right
    while stack:
        nid = stack.pop()
        k = kind[nid]
        if k == KIND_LEAF:
            out.append(forest.leaves[nid])
        elif k in (KIND_SPLIT, KIND_SPLIT_NONE):
            stack.append(int(right[nid]))
            stack.append(int(left[nid]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/glove_1m")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--count", type=int, default=10)
    args = ap.parse_args()

    db = Database(args.db)
    r = Reader.open(db.read(), 0, db, metric="cosine")
    forest, store = r._state.forest, r._state.store
    m, dims = r.n_items(), r.dimensions()
    print(f"index: {m} items x {dims}d, {r.n_trees()} trees", flush=True)

    rows = store.rows()[:m].astype(np.float32)
    unit = rows / np.maximum(np.linalg.norm(rows, axis=1), 1e-30)[:, None]

    rng = np.random.default_rng(args.seed)
    n = m + args.queries
    n_clusters = 1024
    sizes = rng.zipf(1.3, size=n_clusters).astype(np.float64)
    probs = sizes / sizes.sum()
    rank = max(dims // 4, 4)
    basis = rng.standard_normal((rank, dims)).astype(np.float32)
    centers = rng.standard_normal((n_clusters, rank)).astype(np.float32) @ basis
    scales = np.exp(rng.normal(-0.7, 0.5, n_clusters)).astype(np.float32)
    cl = rng.choice(n_clusters, size=n, p=probs)
    allx = centers[cl] + scales[cl][:, None] * (
        rng.standard_normal((n, rank)).astype(np.float32) @ basis
        + 0.1 * rng.standard_normal((n, dims)).astype(np.float32)
    )
    allx *= np.exp(rng.normal(0.0, 0.4, n)).astype(np.float32)[:, None]
    q = allx[m:]
    uq = q / np.maximum(np.linalg.norm(q, axis=1), 1e-30)[:, None]

    t0 = time.perf_counter()
    gt_scores = uq @ unit.T
    gt = np.argpartition(-gt_scores, args.count, axis=1)[:, : args.count]
    print(f"ground truth: {time.perf_counter() - t0:.1f}s", flush=True)

    B, k = len(q), args.count

    def build_blocks(tree_idx, P):
        """Leaf-aligned P-blocks for one tree: [NB, P] int64 slots, -1 pad."""
        leaves = tree_leaf_arrays(forest, forest.roots[tree_idx])
        blks = []
        for ids in leaves:
            nsub = -(-len(ids) // P)
            pad = np.full(nsub * P, -1, np.int64)
            pad[: len(ids)] = ids
            blks.append(pad.reshape(nsub, P))
        blk = np.concatenate(blks, axis=0)
        safe = np.maximum(blk, 0)
        u = unit[safe] * (blk >= 0)[:, :, None]
        cent = u.sum(axis=1)
        cent /= np.maximum(np.linalg.norm(cent, axis=1), 1e-30)[:, None]
        return blk, cent

    cache = {}

    def eval_cfg(T, P, L):
        tabs = []
        for t in range(T):
            if (t, P) not in cache:
                cache[(t, P)] = build_blocks(t, P)
            tabs.append(cache[(t, P)])
        if L >= len(tabs[0][0]):
            return None
        hits = cands = 0
        for b in range(B):
            got = []
            for blk, cent in tabs:
                sc = cent @ uq[b]
                top = np.argpartition(-sc, L)[:L]
                g = blk[top].ravel()
                got.append(g[g >= 0])
            cand = np.unique(np.concatenate(got))
            cands += len(cand)
            sc = gt_scores[b, cand]
            top = cand[np.argpartition(-sc, min(k, len(sc) - 1))[:k]]
            hits += len(np.intersect1d(top, gt[b]))
        return hits / (B * k), cands / B

    print("\n-- leaf-aligned blocks: T trees x top-L P-blocks --", flush=True)
    for T, P, L in (
        (4, 64, 64), (4, 64, 96), (4, 64, 128), (4, 64, 192),
        (4, 32, 128), (4, 32, 192), (4, 32, 256),
        (2, 64, 128), (2, 64, 256), (8, 64, 64), (8, 64, 96),
        (6, 64, 96),
    ):
        out = eval_cfg(T, P, L)
        if out is None:
            continue
        rec, cc = out
        print(
            f"T={T} P={P:3d} L={L:4d}: recall@10={rec:.4f}  "
            f"uniq_cand/q={cc:8.0f}  gathered_slots={T * L * P:7d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
