"""CPU recall experiment: centroid-ranked leaf probing over a built forest.

Validates the design hypothesis for the TPU leaf-routed serving mode
(VERDICT r2 item 2): treat the forest's Descendants leaves as IVF-style
cells, rank cells per query by one centroid matmul, and rescore only the
top-L cells' items.  This replaces the scatter/gather-bound best-first
pop loop (measured 96 ms traverse + 261 ms expansion + 95 ms mask
scatter per 256-query batch at 1.18M x 100, sk=20000) with one [B, n_leaves]
MXU matmul + contiguous block gathers.

Deviation from the reference's traversal (src/reader.rs:317-401):
leaves are ranked by centroid similarity instead of hyperplane-margin
best-first order.  This script measures the recall consequence on the
persisted 1.18M glove-class index — pure host numpy, zero chip time.

    python scripts/leafprobe_experiment.py [--db /tmp/glove_1m]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from arroy_tpu import Database, Reader
from arroy_tpu.models.forest import KIND_LEAF, KIND_SPLIT, KIND_SPLIT_NONE


def tree_leaves(forest, root):
    """Leaf node ids reachable from one root."""
    out, stack = [], [int(root)]
    kind, left, right = forest.kind, forest.left, forest.right
    while stack:
        nid = stack.pop()
        k = kind[nid]
        if k == KIND_LEAF:
            out.append(nid)
        elif k in (KIND_SPLIT, KIND_SPLIT_NONE):
            stack.append(int(left[nid]))
            stack.append(int(right[nid]))
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
    st = r._state
    forest, store = st.forest, st.store
    m, dims = r.n_items(), r.dimensions()
    print(f"index: {m} items x {dims}d, {r.n_trees()} trees", flush=True)

    # corpus rows by slot (no deletes in this index: slot == item id)
    ids = store.ids()
    slots = store.slots_of(ids)
    assert np.array_equal(np.sort(ids), ids) and np.array_equal(slots, np.arange(m))
    rows = store.rows()[:m].astype(np.float32)
    norms = np.linalg.norm(rows, axis=1)
    unit = rows / np.maximum(norms, 1e-30)[:, None]

    # queries: same mixture the sweep used (recall_sweep --data glove)
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

    # exact ground truth (cosine ranking == unit-dot ranking)
    t0 = time.perf_counter()
    gt_scores = uq @ unit.T  # [B, M]
    gt = np.argpartition(-gt_scores, args.count, axis=1)[:, : args.count]
    # (set-recall only; no need to sort within top-k)
    print(f"ground truth: {time.perf_counter() - t0:.1f}s", flush=True)

    # per-tree leaf tables
    trees = []
    for root in forest.roots:
        lids = tree_leaves(forest, root)
        members = [forest.leaves[l] for l in lids]
        lens = np.array([len(mb) for mb in members])
        cat = np.concatenate(members).astype(np.int64)
        starts = np.zeros(len(lids) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        # spherical centroid of member unit rows
        sums = np.add.reduceat(unit[cat], starts[:-1], axis=0)
        cent = sums / np.maximum(np.linalg.norm(sums, axis=1), 1e-30)[:, None]
        trees.append(dict(cat=cat, starts=starts, cent=cent, lens=lens))
        if len(trees) == 1:
            print(
                f"tree0: {len(lids)} leaves, len p50={int(np.median(lens))} "
                f"max={lens.max()}",
                flush=True,
            )
        if len(trees) >= 8:
            break

    B, k = len(q), args.count

    def probe(tree_sel, L):
        """Union of top-L leaves from each tree in tree_sel."""
        hits = 0
        cands = 0
        for b in range(B):
            got = []
            for ti in tree_sel:
                t = trees[ti]
                sc = t["cent"] @ uq[b]
                top = np.argpartition(-sc, min(L, len(sc) - 1))[:L]
                for l in top:
                    got.append(t["cat"][t["starts"][l] : t["starts"][l + 1]])
            cand = np.unique(np.concatenate(got))
            cands += len(cand)
            sc = gt_scores[b, cand]
            top = cand[np.argpartition(-sc, min(k, len(sc) - 1))[:k]]
            hits += len(np.intersect1d(top, gt[b]))
        return hits / (B * k), cands / B

    print("\n-- single tree, top-L leaves by centroid --", flush=True)
    for L in (32, 64, 128, 256, 512, 1024):
        rec, cc = probe([0], L)
        print(f"T=1 L={L:5d}: recall@10={rec:.4f}  cand/q={cc:8.0f}", flush=True)

    print("\n-- multi-tree union --", flush=True)
    for T, L in ((2, 64), (2, 128), (2, 256), (4, 64), (4, 128), (4, 256), (8, 128)):
        rec, cc = probe(list(range(T)), L)
        print(f"T={T} L={L:5d}: recall@10={rec:.4f}  cand/q={cc:8.0f}", flush=True)


if __name__ == "__main__":
    main()
