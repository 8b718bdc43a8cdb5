"""CPU recall experiment: fixed-size block probing over a DFS-flattened tree.

Variant of leafprobe_experiment.py: instead of ragged leaves, flatten one
tree's items in DFS-leaf order (hierarchical locality) and cut the
permutation into FIXED P-item blocks.  Every block is 100% full, the
serving gather is uniform [Nb, P, d], and block centroids give the same
probe targeting at finer, uniform granularity.

    python scripts/blockprobe_experiment.py [--db /tmp/glove_1m]
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


def dfs_leaf_order(forest, root):
    """Item ids of one tree concatenated in DFS leaf order."""
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
    return np.concatenate(out).astype(np.int64)


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

    def eval_blocks(perm_list, P, L):
        """Probe top-L P-blocks (by centroid) from each perm in perm_list."""
        tabs = []
        for perm in perm_list:
            nb = len(perm) // P
            blk = perm[: nb * P].reshape(nb, P)
            cent = unit[blk].mean(axis=1)
            cent /= np.maximum(np.linalg.norm(cent, axis=1), 1e-30)[:, None]
            tabs.append((blk, cent))
        hits = cands = 0
        for b in range(B):
            got = []
            for blk, cent in tabs:
                sc = cent @ uq[b]
                top = np.argpartition(-sc, min(L, len(sc) - 1))[:L]
                got.append(blk[top].ravel())
            cand = np.unique(np.concatenate(got))
            cands += len(cand)
            sc = gt_scores[b, cand]
            top = cand[np.argpartition(-sc, min(k, len(sc) - 1))[:k]]
            hits += len(np.intersect1d(top, gt[b]))
        return hits / (B * k), cands / B

    perms = [dfs_leaf_order(forest, forest.roots[t]) for t in range(4)]
    print("perms built", flush=True)

    print("\n-- single tree, fixed P-blocks --", flush=True)
    for P in (32, 64, 128):
        for L in (64, 128, 256, 512, 1024):
            if P * L > 80_000:
                continue
            rec, cc = eval_blocks(perms[:1], P, L)
            print(
                f"T=1 P={P:3d} L={L:5d}: recall@10={rec:.4f}  cand/q={cc:8.0f}",
                flush=True,
            )

    print("\n-- multi-tree union, fixed P-blocks --", flush=True)
    for T, P, L in ((2, 64, 128), (2, 64, 256), (4, 64, 64), (4, 64, 128), (2, 32, 256), (4, 32, 128)):
        rec, cc = eval_blocks(perms[:T], P, L)
        print(
            f"T={T} P={P:3d} L={L:5d}: recall@10={rec:.4f}  cand/q={cc:8.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
