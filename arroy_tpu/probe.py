"""Leaf-probe serving engine: centroid-ranked block probing of the forest.

TPU-first replacement for the best-first pop loop at large corpus sizes.
The reference's query walks a global priority queue of hyperplane
margins, popping one node at a time until `search_k` candidates are
gathered (reference: src/reader.rs:317-401).  On TPU that loop is
latency-bound (hundreds of serial, scatter/gather-heavy iterations:
measured 96 ms traverse + 261 ms leaf expansion + 95 ms candidate
scatter per 256-query batch at 1.18M x 100, sk=20000 — ~551 qps).

This engine keeps the forest's partition but replaces the *order* in
which it is searched:

1. Each of the first T trees' leaves is cut into fixed-size P-item
   blocks (leaf-aligned: blocks never straddle a leaf; leaves larger
   than P are split, the tail is padded).  Block member rows are stored
   contiguously ([NB, P, d], optionally bfloat16), one copy per probe
   tree, with a per-block centroid.
2. A query ranks ALL blocks of each tree with ONE centroid matmul and
   takes the top-L blocks per tree (`search_k ≈ T·L·P` keeps arroy's
   candidate-budget semantics).
3. The selected blocks are fetched as contiguous DMA slices and scored
   with one batched matmul; a top-k2 cut, an exact f32 re-score, and a
   slot-dedup produce the final top-k.

Deviation (documented, PARITY.md): candidate selection is by centroid
similarity per tree instead of global best-first margin order.  Recall
at equal candidate budget was measured within a few points of the
strict traversal on a 1.18M x 100 clustered corpus (see
scripts/leafprobe_experiment.py and results/leafprobe_r03.log), while
every stage is a dense MXU/DMA operation.  Multi-tree union is what
makes the forest earn its keep: disagreeing trees cover each other's
cell-boundary misses — single-tree probing needs ~4x the candidates
for the same recall.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .models.forest import KIND_LEAF, KIND_SPLIT, KIND_SPLIT_NONE
from .ops.binary import (
    WORD_BITS,
    n_words,
    pack_bits_jnp,
    pack_bits_np,
    unpack_bits_jnp,
    unpack_bits_np,
)

_INF = jnp.float32(jnp.inf)
_EPS = jnp.float32(1e-30)

#: default probe geometry (overridable per Searcher / env).  More probe
#: trees at a fixed gathered-slot budget is measured strictly better
#: (1.18M x 100: T=8 L=64 0.977 vs T=4 L=128 0.947 at 32.8k slots —
#: results/leafprobe_r03.log), so "auto" takes as many trees as the
#: block-table HBM budget allows, up to 8.
DEFAULT_TREES = os.environ.get("ARROY_PROBE_TREES", "auto")
DEFAULT_BLOCK = int(os.environ.get("ARROY_PROBE_BLOCK", 64))
#: HBM budget for the duplicated block tables (bf16 rows); per-tree cost
#: is ~1.3 x n_items x dims x itemsize (leaf-padding fill ~0.78)
PROBE_BYTES = int(os.environ.get("ARROY_PROBE_BYTES", 4 << 30))
#: HBM budget for the query-time gathered-block temporary.  The block
#: gather materializes [B, C, P, d] rows (plus XLA's f32 upcast of the
#: bf16 operand), so an unchunked gather scales as ~6·B·search_k·d
#: bytes: at B=256, sk=16000, d=768 that is 18.8 GB — a measured
#: compile-time HBM OOM on v5e (crossover sweep, 524k x 768).  Past
#: this budget the probe scores blocks in chunks with stacked
#: per-chunk winners and one final merge (the streaming exact scan's
#: pattern).
PROBE_GATHER_BYTES = int(os.environ.get("ARROY_PROBE_GATHER_BYTES", 1 << 30))


def _per_tree_bytes(idx, dtype: str) -> int:
    if dtype == "bq":
        per_item = n_words(idx.dims) * 4
    elif dtype == "int8":
        per_item = idx.dims + 4  # rows + per-item f32 scale
    else:
        per_item = (2 if dtype == "bf16" else 4) * idx.dims
    return max(int(1.3 * idx.n_items * per_item), 1)


def auto_trees(idx, dtype: str) -> int:
    return max(2, min(PROBE_BYTES // _per_tree_bytes(idx, dtype), 8))


def auto_dtype(idx) -> str:
    """Pick the block-row representation for ``dtype="auto"``.

    bf16 rows when ≥4 probe trees fit the HBM table budget (multi-tree
    union is what buys recall — probe.py module docstring); else
    per-item-max-abs int8 rows (2x smaller, ~0.4% dot error — near
    bf16 recall) when ≥3 trees fit; else packed sign-bit blocks (16x
    smaller than bf16 at 768-d: ~96 B vs 1,536 B per item) scored by
    XOR-popcount with a search_k-tracking exact f32 re-score cut — the
    reference's binary-quantized oversampling semantics (reference:
    src/distance/binary_quantized_cosine.rs:36) applied to the probe's
    candidate stage instead of the whole index.
    """
    if PROBE_BYTES // _per_tree_bytes(idx, "bf16") >= 4:
        return "bf16"
    if PROBE_BYTES // _per_tree_bytes(idx, "int8") >= 3:
        return "int8"
    return "bq"


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass(frozen=True)
class ProbeTables:
    """Device-resident block tables for T probe trees (leaf-aligned)."""

    n_trees: int
    block: int
    nb_max: int  # blocks per tree, padded
    fill: float  # real slots / (NB*P) — leaf-padding density
    cent: jnp.ndarray  # [T*nb_max, sd] f32 block centroids
    caux: jnp.ndarray  # [T*nb_max] f32 centroid score term (‖c‖² or 0)
    valid: jnp.ndarray  # [T*nb_max] bool
    blk_rows: jnp.ndarray  # [T*nb_max, P, sd] item rows (bf16/f32/int8/u32)
    blk_aux: jnp.ndarray  # [T*nb_max, P] per-item score term
    blk_slots: jnp.ndarray  # [T*nb_max, P] int32 slots, -1 pad
    blk_scale: jnp.ndarray  # [T*nb_max, P] f32 int8 dequant scale ([1,1] else)

    def nbytes(self) -> int:
        total = 0
        for f in (self.cent, self.caux, self.valid, self.blk_rows,
                  self.blk_aux, self.blk_slots, self.blk_scale):
            total += int(np.prod(f.shape)) * f.dtype.itemsize
        return total


def supports(metric) -> bool:
    """Every built-in metric is probe-servable: f32 metrics through
    bf16/int8/bq block tables, binary-quantized metrics through native
    packed-word blocks scored by XOR-popcount (ranking-EXACT for all
    three BQ metrics, so the re-score cut needs no oversampling)."""
    return True


def _tree_leaves(forest, root: int) -> list[np.ndarray]:
    """Leaf member-id arrays of one tree in DFS order."""
    out: list[np.ndarray] = []
    stack = [int(root)]
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


def build_tables_np(
    metric, dims: int, store, forest, n_trees: int, block: int, dtype: str = "bf16"
) -> dict:
    """Host-side pack of the probe block tables as NUMPY arrays.

    Shared by the single-chip `build_tables` (uploads to one device) and
    the sharded forest fan-out (`parallel/forest.py` stacks per-shard
    tables along the mesh axis before one sharded device_put)."""
    import ml_dtypes

    P = int(block)
    T = max(1, min(int(n_trees), len(forest.roots)))
    rows = store.rows()
    norms = store.norms()
    sd = rows.shape[1] if rows.ndim == 2 else dims

    name = metric.name
    # probe the T trees with the FEWEST blocks: any trees serve (the
    # union is what buys recall), and the block table is padded to the
    # largest probed tree, so skipping lopsided trees cuts nb_max — at
    # 1.18M x 25 the first-8 choice padded to 28.5k blocks where the
    # most balanced 8 pad to ~20k (-30% HBM and upload)
    all_leaves = [_tree_leaves(forest, root) for root in forest.roots]
    blocks_of = [
        sum(-(-len(ids) // P) for ids in tree if len(ids))
        for tree in all_leaves
    ]
    order = np.argsort(np.asarray(blocks_of, np.int64), kind="stable")[:T]
    nb_max = max(max((blocks_of[t] for t in order), default=1), 1)

    # vectorized block packing (the per-leaf Python loop cost ~100s of
    # the 143s table build at 1.18M x 8 trees): leaf items are
    # contiguous in block-span order, so each tree is ONE id concat,
    # ONE slots_of, and ONE scatter at arithmetic destinations
    slots_all = np.full((T * nb_max, P), -1, np.int32)
    valid_all = np.zeros(T * nb_max, bool)
    for t, ti in enumerate(order):
        leaves = [ids for ids in all_leaves[ti] if len(ids)]
        if not leaves:
            valid_all[t * nb_max] = True
            continue
        sizes = np.fromiter((len(v) for v in leaves), np.int64, len(leaves))
        slots = store.slots_of(np.concatenate(leaves)).astype(np.int64)
        nsub = -(-sizes // P)  # blocks per leaf
        span_start = np.concatenate([[0], np.cumsum(nsub * P)[:-1]])
        within = np.arange(len(slots), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes
        )
        dest = np.repeat(span_start, sizes) + within
        nb = int(nsub.sum())
        flat = np.full(nb * P, -1, np.int64)
        flat[dest] = slots
        slots_all[t * nb_max : t * nb_max + nb] = flat.reshape(nb, P)
        valid_all[t * nb_max : t * nb_max + nb] = True

    # gather block rows + centroids, chunked over blocks (the full
    # [T*nb, P, d] f32 intermediate is ~32 GB at 1M x 768 x 8 trees)
    NBT = T * nb_max
    if metric.binary:
        # binary-quantized metrics: storage is ALREADY packed sign-bit
        # words, so the block table is a direct slice of the item rows
        # (no extra quantization).  Centroids live in the ±1 decode
        # space; in-block XOR-popcount scores are ranking-exact for all
        # three BQ metrics (reference distance formulas are affine in
        # the hamming count — src/distance/binary_quantized_*.rs).
        w = rows.shape[1]
        d_pad = w * WORD_BITS
        brows_out = np.zeros((NBT, P, w), np.uint32)
        baux_all = np.zeros((NBT, P), np.float32)
        cent_all = np.zeros((NBT, d_pad), np.float32)
        caux_all = np.zeros(NBT, np.float32)
        scale_all = np.zeros((1, 1), np.float32)
        chunk = max(1, (512 << 20) // max(P * d_pad * 4, 1))
        cosine = name == "binary quantized cosine"
        for lo in range(0, NBT, chunk):
            hi = min(lo + chunk, NBT)
            sl = slots_all[lo:hi]
            safe = np.maximum(sl, 0)
            live = sl >= 0
            br = rows[safe.reshape(-1)].reshape(hi - lo, P, w)
            br[~live] = 0
            dec = unpack_bits_np(br, d_pad).astype(np.float32)  # ±1
            dec[~live] = 0.0
            cnt = np.maximum(live.sum(axis=1), 1).astype(np.float32)
            c = dec.sum(axis=1) / cnt[:, None]
            if cosine:
                cn = np.linalg.norm(c, axis=1)
                cent_all[lo:hi] = c / np.maximum(cn, 1e-30)[:, None]
            else:
                cent_all[lo:hi] = c
                caux_all[lo:hi] = np.einsum("nd,nd->n", c, c)
            brows_out[lo:hi] = br
        n_real = int((slots_all >= 0).sum())
        return {
            "n_trees": T,
            "block": P,
            "nb_max": nb_max,
            "fill": max(n_real / float(slots_all.size), 1e-6),
            "cent": cent_all,
            "caux": caux_all,
            "valid": valid_all,
            "blk_rows": brows_out,
            "blk_aux": baux_all,
            "blk_slots": slots_all,
            "blk_scale": scale_all,
        }
    if dtype == "bq":
        # packed sign-bit rows: 16x smaller than bf16 at 768-d.  the
        # in-block score estimates dots from sign agreement scaled by
        # stored norms, so baux = ‖x‖ for EVERY metric here
        brows_out = np.zeros((NBT, P, n_words(sd)), np.uint32)
    elif dtype == "int8":
        # per-item max-abs int8: x ≈ scale_i · r_i8, dot error ~0.4%
        brows_out = np.zeros((NBT, P, sd), np.int8)
    else:
        brows_out = np.zeros(
            (NBT, P, sd), ml_dtypes.bfloat16 if dtype == "bf16" else np.float32
        )
    scale_all = (
        np.zeros((NBT, P), np.float32)
        if dtype == "int8"
        else np.zeros((1, 1), np.float32)
    )
    baux_all = np.zeros((NBT, P), np.float32)
    cent_all = np.zeros((NBT, sd), np.float32)
    caux_all = np.zeros(NBT, np.float32)
    chunk = max(1, (512 << 20) // max(P * sd * 4, 1))
    for lo in range(0, NBT, chunk):
        hi = min(lo + chunk, NBT)
        sl = slots_all[lo:hi]
        safe = np.maximum(sl, 0)
        live = sl >= 0
        br = rows[safe.reshape(-1)].reshape(hi - lo, P, sd)
        br[~live] = 0
        nr = norms[safe].astype(np.float32)
        nr[~live] = 0.0
        if dtype == "bq" or name == "cosine":
            baux_all[lo:hi] = nr
        elif name in ("euclidean", "manhattan"):
            baux_all[lo:hi] = nr * nr
        if name == "cosine":
            # spherical centroid: normalized mean of unit member rows
            bn = np.where(live, np.maximum(nr, 1e-30), np.inf)
            c = np.einsum("npd,np->nd", br, (1.0 / bn).astype(np.float32))
            cn = np.linalg.norm(c, axis=1)
            cent_all[lo:hi] = c / np.maximum(cn, 1e-30)[:, None]
        else:
            # euclidean / manhattan / dot-product: mean of raw rows;
            # euclidean-family ranks blocks by 2·q·c − ‖c‖²
            cnt = np.maximum(live.sum(axis=1), 1).astype(np.float32)
            c = br.sum(axis=1) / cnt[:, None]
            cent_all[lo:hi] = c
            if name in ("euclidean", "manhattan"):
                caux_all[lo:hi] = np.einsum("nd,nd->n", c, c)
        if dtype == "bq":
            brows_out[lo:hi] = pack_bits_np(br)
        elif dtype == "int8":
            mx = np.abs(br).max(axis=2)  # [n, P]
            sc = np.maximum(mx, 1e-30) / 127.0
            brows_out[lo:hi] = np.clip(
                np.rint(br / sc[..., None]), -127, 127
            ).astype(np.int8)
            scale_all[lo:hi] = np.where(mx > 0, sc, 0.0)
        else:
            brows_out[lo:hi] = br.astype(brows_out.dtype)
    brows = brows_out

    n_real = int((slots_all >= 0).sum())
    return {
        "n_trees": T,
        "block": P,
        "nb_max": nb_max,
        "fill": max(n_real / float(slots_all.size), 1e-6),
        "cent": cent_all,
        "caux": caux_all,
        "valid": valid_all,
        "blk_rows": brows,
        "blk_aux": baux_all,
        "blk_slots": slots_all,
        "blk_scale": scale_all,
    }


def build_tables(
    metric, dims: int, store, forest, n_trees: int, block: int, dtype: str = "bf16"
) -> ProbeTables:
    """Single-device probe tables (one upload per searcher geometry;
    cached on the DeviceIndex by `get_tables`)."""
    from .models.items import _staged_rows_put

    t = build_tables_np(metric, dims, store, forest, n_trees, block, dtype)
    return ProbeTables(
        n_trees=t["n_trees"],
        block=t["block"],
        nb_max=t["nb_max"],
        fill=t["fill"],
        cent=jnp.asarray(t["cent"]),
        caux=jnp.asarray(t["caux"]),
        valid=jnp.asarray(t["valid"]),
        # ~GBs at 1M+: chunked upload with tunnel-degradation backoff
        blk_rows=_staged_rows_put(t["blk_rows"]),
        blk_aux=jnp.asarray(t["blk_aux"]),
        blk_slots=jnp.asarray(t["blk_slots"]),
        blk_scale=jnp.asarray(t["blk_scale"]),
    )


def get_tables(idx, state, n_trees: int, block: int, dtype: str) -> ProbeTables:
    """Cached probe tables on the (frozen) DeviceIndex instance."""
    cache = getattr(idx, "_probe_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(idx, "_probe_cache", cache)
    key = (int(n_trees), int(block), dtype)
    hit = cache.get(key)
    if hit is None:
        hit = build_tables(
            idx.metric, idx.dims, state.store, state.forest, n_trees, block, dtype
        )
        cache[key] = hit
    return hit


def _probe_core(
    metric, dims, k, k2, L, nb_max, scale,
    cent, caux, valid, blk_rows, blk_aux, blk_slots, blk_scale,
    rows, norms, extras, slot_to_id,
    qv, qn, qe,
    normalize=True,
    fwords=None,
    has_filter=False,
):
    name = metric.name
    b = qv.shape[0]
    T = cent.shape[0] // nb_max
    P = blk_rows.shape[1]

    # 1. rank all blocks of each probe tree with one matmul.  Binary
    # metrics store packed queries; the centroid table lives in the ±1
    # decode space, so decode the query once here.
    qcent = (
        unpack_bits_jnp(qv, cent.shape[1]).astype(jnp.float32)
        if metric.binary
        else qv
    )
    dots = jax.lax.dot_general(
        qcent, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, T*nb_max]
    score = jnp.float32(scale) * dots - caux[None, :]
    score = jnp.where(valid[None, :], score, -_INF)
    score3 = score.reshape(b, T, nb_max)
    # approx_max_k, not top_k: a full [B, T, nb] sort measured 67.8 ms
    # vs 5.7 ms approximate at nb=28.5k on chip (results/
    # probe_profile_r03.log); the ~2% of blocks it swaps are marginal
    # ones whose members rarely reach the exact-re-scored top-k2
    if L < nb_max:
        _, topL = jax.lax.approx_max_k(score3, L, recall_target=0.95)
    else:
        _, topL = jax.lax.top_k(score3, L)  # [B, T, L]
    base = (jnp.arange(T, dtype=jnp.int32) * nb_max)[None, :, None]
    bid = (topL + base).reshape(b, T * L)  # [B, C]

    # 2. fetch the selected blocks (contiguous DMA slices) and score
    if metric.binary:
        qbits = qv  # already packed sign-bit words
        qnorm = None
        qbf = None
    elif blk_rows.dtype == jnp.uint32:
        qbits = pack_bits_jnp(qv)  # [B, w]
        qnorm = jnp.sqrt(
            jnp.maximum(
                jnp.einsum("bd,bd->b", qv, qv, preferred_element_type=jnp.float32),
                0.0,
            )
        )
        qbf = None
    else:
        qbits = qnorm = None
        qbf = qv.astype(
            jnp.bfloat16 if blk_rows.dtype == jnp.int8 else blk_rows.dtype
        )

    def score_blocks(bidc):
        """Gather + score one [B, c] slab of selected block ids (-1 pad)."""
        safe = jnp.maximum(bidc, 0)
        blocks = blk_rows[safe]  # [B, c, P, sd] (or [B, c, P, w] packed)
        baux = blk_aux[safe]  # [B, c, P]
        bslot = jnp.where((bidc >= 0)[..., None], blk_slots[safe], -1)
        if metric.binary:
            # native packed blocks: XOR popcount IS the distance basis —
            # all three BQ distances are affine in the hamming count
            # with per-query-constant coefficients, so ranking by -ham
            # is EXACT (reference: src/distance/binary_quantized_*.rs)
            ham = jnp.sum(
                jax.lax.population_count(
                    jnp.bitwise_xor(blocks, qbits[:, None, None, :])
                ).astype(jnp.int32),
                axis=-1,
            )
            s2 = -ham.astype(jnp.float32)
        elif blk_rows.dtype == jnp.uint32:
            # packed sign-bit blocks: estimate the dot from sign
            # agreement (reference's XNOR-popcount ±1 dot,
            # src/spaces/simple.rs:119-131) scaled by the stored norms:
            # q·x ≈ ‖q‖‖x‖·bqdot/d_pad.  the per-query ‖q‖ factor
            # matters only for the euclidean-family ‖x‖² trade-off; the
            # exact f32 re-score of the (3x-widened, BQ-oversampling
            # semantics) top-k2 fixes the ranking.
            ham = jnp.sum(
                jax.lax.population_count(
                    jnp.bitwise_xor(blocks, qbits[:, None, None, :])
                ).astype(jnp.int32),
                axis=-1,
            )
            d_pad = blk_rows.shape[-1] * WORD_BITS
            bqdot = (d_pad - 2 * ham).astype(jnp.float32)
            if name == "euclidean" or name == "manhattan":
                est_dot = (qnorm[:, None, None] / d_pad) * (baux * bqdot)
                s2 = 2.0 * est_dot - baux * baux
            elif name == "cosine":
                s2 = bqdot  # sign-cosine proxy; norms cancel
            else:
                s2 = baux * bqdot  # raw dot up to the ‖q‖/d_pad const
        else:
            xb = blocks
            if blk_rows.dtype == jnp.int8:
                # dequant AFTER the dot: x ≈ scale_i·r_i8, so
                # q·x ≈ scale_i·(q_bf16·r_bf16); int8→bf16 is exact
                xb = blocks.astype(jnp.bfloat16)
            d2 = jnp.einsum(
                "bcpd,bd->bcp", xb, qbf,
                preferred_element_type=jnp.float32,
            )
            if blk_rows.dtype == jnp.int8:
                d2 = d2 * blk_scale[safe]
            if name == "euclidean" or name == "manhattan":
                s2 = 2.0 * d2 - baux
            elif name == "cosine":
                s2 = d2 / jnp.maximum(baux, _EPS)
            else:
                s2 = d2
        keep = bslot >= 0
        if has_filter:
            # roaring-∩ role at the blocks (reference: src/reader.rs:
            # 354-360): mask non-candidate slots out of the in-block
            # scores so they never consume k2 re-score lanes
            sfs = jnp.maximum(bslot, 0)
            bit = (fwords[sfs >> 5] >> (sfs & 31).astype(jnp.uint32)) & 1
            keep = keep & (bit == 1)
        return jnp.where(keep, s2, -_INF), jnp.where(keep, bslot, -1)

    # the gathered temp is ~[B, c, P, sd] rows PLUS XLA's f32 upcast of
    # a bf16 operand: unchunked at high search_k it exceeds HBM
    # (measured 18.84G at B=256, sk=16000, d=768).  score in chunks of
    # `ch` blocks with per-chunk winners and one final merge.
    C = T * L
    if blk_rows.dtype == jnp.uint32:
        per_slot = blk_rows.shape[-1] * 8
    elif blk_rows.dtype == jnp.int8:
        per_slot = blk_rows.shape[-1] * 4  # i8 gather + bf16 upcast + scale
    else:
        per_slot = blk_rows.shape[-1] * (
            6 if blk_rows.dtype == jnp.bfloat16 else 8
        )
    ch = max(1, int(PROBE_GATHER_BYTES) // max(b * P * per_slot, 1))
    if C <= ch:
        s2, bslot = score_blocks(bid)
        s2f = s2.reshape(b, C * P)
        slotf = bslot.reshape(b, C * P)
        if k2 < C * P:
            sel_s, sel_i = jax.lax.approx_max_k(s2f, k2, recall_target=0.99)
            cand = jnp.take_along_axis(slotf, sel_i, axis=1)
        else:
            sel_s, cand = s2f, slotf
    else:
        nch = -(-C // ch)
        pad = nch * ch - C
        bid_p = (
            jnp.concatenate([bid, jnp.full((b, pad), -1, bid.dtype)], axis=1)
            if pad
            else bid
        )
        chunks = bid_p.reshape(b, nch, ch).transpose(1, 0, 2)  # [nch, B, ch]
        k2c = min(k2, ch * P)

        def body(carry, bidc):
            s2c, bslotc = score_blocks(bidc)
            s2f = s2c.reshape(b, ch * P)
            slotf = bslotc.reshape(b, ch * P)
            if k2c < ch * P:
                v, i = jax.lax.approx_max_k(s2f, k2c, recall_target=0.99)
                s = jnp.take_along_axis(slotf, i, axis=1)
            else:
                v, s = s2f, slotf
            return carry, (v, s)

        _, (vs, ss_c) = jax.lax.scan(body, 0, chunks)
        allv = vs.transpose(1, 0, 2).reshape(b, nch * k2c)
        alls = ss_c.transpose(1, 0, 2).reshape(b, nch * k2c)
        if k2 < nch * k2c:
            sel_s, sel_i = jax.lax.approx_max_k(allv, k2, recall_target=0.99)
            cand = jnp.take_along_axis(alls, sel_i, axis=1)
        else:
            sel_s, cand = allv, alls

    # 3. exact f32 re-score of the k2 winners + slot-dedup + top-k.
    # dedup FIRST (cross-tree duplicate rate is 20-30% at T=4..8) so the
    # re-score gathers each surviving slot once; past the gather budget
    # (sign-bit tables scale k2 with search_k — see make_probe_fn) the
    # re-score runs in chunks with per-chunk top-k and one final merge.
    order = jnp.argsort(cand, axis=1)
    ss = jnp.take_along_axis(cand, order, axis=1)
    sv = jnp.take_along_axis(sel_s, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), ss[:, 1:] == ss[:, :-1]], axis=1
    )
    live = (ss >= 0) & (sv > -_INF) & ~dup

    def exact_chunk(slots_c, live_c):
        cs = jnp.maximum(slots_c, 0)
        x = rows[cs]  # packed words stay packed for binary metrics
        if not metric.binary:
            x = x.astype(jnp.float32)
        xn = norms[cs]
        xe = extras[cs]
        d = metric.built_distance(
            qv[:, None, :], qn[:, None], qe[:, None], x, xn, xe
        )
        return jnp.where(live_c, d, _INF)

    kq = ss.shape[1]  # actual candidate width (== k2 unless pool < cut)
    per_cand = rows.shape[1] * 8  # gathered f32 rows + distance temps
    ck = max(k, int(PROBE_GATHER_BYTES) // max(b * per_cand, 1))
    if kq <= ck:
        sd_ = exact_chunk(ss, live)
        neg, top_i = jax.lax.top_k(-sd_, k)
        sel_slots = jnp.take_along_axis(ss, top_i, axis=1)
    else:
        nch = -(-kq // ck)
        pad = nch * ck - kq
        if pad:
            ss = jnp.concatenate(
                [ss, jnp.full((b, pad), -1, ss.dtype)], axis=1
            )
            live = jnp.concatenate(
                [live, jnp.zeros((b, pad), bool)], axis=1
            )
        ss3 = ss.reshape(b, nch, ck).transpose(1, 0, 2)
        lv3 = live.reshape(b, nch, ck).transpose(1, 0, 2)

        def body(carry, xs):
            slots_c, live_c = xs
            dc = exact_chunk(slots_c, live_c)
            negc, ic = jax.lax.top_k(-dc, k)
            return carry, (negc, jnp.take_along_axis(slots_c, ic, axis=1))

        _, (negs, slts) = jax.lax.scan(body, 0, (ss3, lv3))
        alln = negs.transpose(1, 0, 2).reshape(b, nch * k)
        alls = slts.transpose(1, 0, 2).reshape(b, nch * k)
        neg, top_i = jax.lax.top_k(alln, k)
        sel_slots = jnp.take_along_axis(alls, top_i, axis=1)
    out_d = -neg
    ids = slot_to_id[jnp.maximum(sel_slots, 0)]
    if not normalize:
        # sharded fan-out merges raw built distances across shards first
        # (parallel/forest.py); inf marks padding/dead lanes there
        return ids, out_d
    out_d = jnp.where(
        out_d < _INF, metric.normalized_distance(out_d, dims), jnp.float32(jnp.nan)
    )
    ids = jnp.where(jnp.isnan(out_d), jnp.uint32(0), ids)
    return ids, out_d


_probe_impl = functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "dims", "k", "k2", "L", "nb_max", "scale", "normalize",
        "has_filter",
    ),
)(_probe_core)


def make_probe_fn(
    idx,
    state,
    count: int,
    search_k: int,
    n_trees: int | str = "auto",
    block: int | str = "auto",
    dtype: str = "auto",
    filter_slots: np.ndarray | None = None,
):
    """Bind a leaf-probe serving fn: ``fn(qv, qn, qe, qf) -> (ids, dists)``.

    ``search_k`` keeps arroy's candidate-budget semantics: the probe
    touches ``T·L·P ≈ search_k`` item slots (L = per-tree probed
    blocks).  ``filter_slots`` serves the roaring-∩ contract: gathered
    block slots are masked against the candidate bitmap before they can
    reach the re-score (reference: src/reader.rs:354-360), and the
    probed-block budget scales with 1/selectivity — mirroring the
    reference's traversal exploring more leaves until `search_k`
    MATCHING candidates are gathered.  Binary-quantized metrics serve
    natively: packed-word block tables scored by XOR popcount, which is
    ranking-exact for all three BQ distances.
    """
    if idx.metric.binary:
        dtype = "bq"  # native packed words — the only storage there is
    if dtype == "auto":
        dtype = os.environ.get("ARROY_PROBE_DTYPE", "auto")
    if dtype == "auto":
        dtype = auto_dtype(idx)
    if n_trees == "auto":
        n_trees = DEFAULT_TREES
    T = auto_trees(idx, dtype) if n_trees == "auto" else int(n_trees)
    T = max(1, min(T, len(idx.roots)))
    P = DEFAULT_BLOCK if block == "auto" else int(block)
    tabs = get_tables(idx, state, T, P, dtype)
    nb_max = tabs.nb_max
    # search_k counts REAL candidate slots (arroy's budget semantics):
    # scale the probed-block count by the leaf-padding fill — and by
    # 1/selectivity when filtered, since only matching slots count
    # toward the budget
    has_filter = filter_slots is not None
    sel = 1.0
    if has_filter:
        sel = max(len(filter_slots) / max(idx.n_items, 1), 1e-6)
        nwords = max((idx.cap + 31) // 32, 1)
        words = np.zeros(nwords, np.uint32)
        fs = np.asarray(filter_slots, dtype=np.int64)
        np.bitwise_or.at(
            words, fs >> 5, np.uint32(1) << (fs & 31).astype(np.uint32)
        )
        fwords = jnp.asarray(words)
    else:
        fwords = jnp.zeros(1, jnp.uint32)
    eff = max(int(T * P * tabs.fill * sel), 1)
    L = max(1, min(-(-int(search_k) // eff), nb_max))
    k = max(1, int(count))
    # generous exact-rescore cut: the [B, k2] final gather is cheap and
    # washes out bf16 selection noise + cross-tree duplicates occupying
    # k2 slots (dup rate ~20-30% at T=4..8).  sign-bit blocks for f32
    # metrics score with real error at high d, so their cut tracks HALF
    # the candidate budget (a fixed cut made recall DECREASE with
    # search_k at 1M x 768: the sign-score top-2048 converges to a
    # fixed set while the pool grows — crossover_r03) with the
    # reference's 3x BQ oversampling constant as the floor
    # (reference: src/distance/binary_quantized_cosine.rs:36).  Binary
    # METRICS are different: their in-block popcount ranking is exact,
    # so they take the plain f32-style cut.
    estimate = dtype == "bq" and not idx.metric.binary
    over = 3 if estimate else 1
    floor = max(32 * k * over, 512 * over)
    if estimate:
        floor = max(floor, int(search_k) // 2)
    k2 = min(_next_pow2(floor), T * L * P)
    scale = (
        2
        if (not idx.metric.binary and idx.metric.name in ("euclidean", "manhattan"))
        or idx.metric.name
        in ("binary quantized euclidean", "binary quantized manhattan")
        else 1
    )

    def fn(qv, qn, qe, qf):
        return _probe_impl(
            idx.metric, idx.dims, k, int(k2), int(L), int(nb_max), int(scale),
            tabs.cent, tabs.caux, tabs.valid,
            tabs.blk_rows, tabs.blk_aux, tabs.blk_slots, tabs.blk_scale,
            idx.rows, idx.norms, idx.extras, idx.slot_to_id,
            qv, qn, qe,
            fwords=fwords, has_filter=has_filter,
        )

    return fn
