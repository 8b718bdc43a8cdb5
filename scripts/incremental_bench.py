"""Incremental update cost at scale (VERDICT r1 weak item 6).

Copies the persisted 100k bench index, then measures:
- insert routing: add N new items + build (drains the updated set,
  routes down frozen trees, re-splits overflowing leaves)
- delete pass: remove N items + build (masked removal + collapse)
- query-after-update recall sanity

    python scripts/incremental_bench.py [n_updates]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from arroy_tpu import Database, Reader, Writer  # noqa: E402

SRC = os.environ.get("BENCH_DB", "/tmp/arroy_bench_100000x768_t10_clustered")
N_UPD = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
D = 768
WORK = "/tmp/arroy_incr_bench"


def tunnel_probe() -> tuple[float, float]:
    """(upload MB/s, download MB/s) of the device tunnel via a 16 MB
    round trip.  The tunnel degrades 10-25x for minutes at a time
    (results/incremental_r02.log measured 32s vs 432s for the same
    binary); probing lets the bench ANNOTATE a degraded run and retry
    once instead of silently reporting tunnel weather as engine cost."""
    import jax.numpy as jnp

    a = np.zeros(4 << 20, np.float32)  # 16 MB
    t0 = time.perf_counter()
    d = jnp.asarray(a)
    jax.block_until_ready(d)
    up = 16.0 / max(time.perf_counter() - t0, 1e-9)
    t0 = time.perf_counter()
    np.asarray(d)
    down = 16.0 / max(time.perf_counter() - t0, 1e-9)
    return up, down


#: below these rates the tunnel counts as degraded (healthy measures
#: ~9 MB/s up / ~33 MB/s down; degraded episodes measure well under half)
_MIN_UP_MBPS = float(os.environ.get("ARROY_TUNNEL_MIN_UP", 3.0))
_MIN_DOWN_MBPS = float(os.environ.get("ARROY_TUNNEL_MIN_DOWN", 8.0))


def main():
    if not os.path.isdir(SRC):
        print(f"missing source index {SRC}; run bench.py first", file=sys.stderr)
        sys.exit(1)
    shutil.rmtree(WORK, ignore_errors=True)
    shutil.copytree(SRC, WORK)
    db = Database(WORK)
    r0 = Reader.open(db.read(), 0, db)
    m0 = r0.n_items()
    print(f"base index: {m0} items, {r0.n_trees()} trees", flush=True)

    rng = np.random.default_rng(777)
    parents = rng.standard_normal((64, D)).astype(np.float32)
    pa, pb = rng.integers(64, size=N_UPD), rng.integers(64, size=N_UPD)
    mask = rng.random((N_UPD, D)) < 0.5
    x_new = np.where(mask, parents[pa], parents[pb]).astype(np.float32)
    x_new += 0.05 * rng.standard_normal((N_UPD, D)).astype(np.float32)
    new_ids = np.arange(m0, m0 + N_UPD, dtype=np.uint32)

    # pin the tree count: without it target_n_trees' formula would grow
    # the 10-tree bench index to its ~530-tree default (a full regrow,
    # not an incremental measurement)
    n_trees = r0.n_trees()
    w = Writer(db, 0, D)

    phases = []

    def track(p):
        phases.append((p.main.name, time.perf_counter()))

    up0, down0 = tunnel_probe()
    print(f"tunnel probe: up {up0:.1f} MB/s  down {down0:.1f} MB/s", flush=True)

    for attempt in range(2):
        phases.clear()
        t0 = time.perf_counter()
        with db.write() as t:
            w.add_items(t, new_ids, x_new)
            t_add = time.perf_counter()
            w.builder(seed=99).n_trees(n_trees).progress(track).build(t)
            t_build = time.perf_counter()
        for (name, ts), (_, nxt) in zip(phases, phases[1:] + [("", t_build)]):
            if nxt - ts > 0.5:
                print(f"  phase {name}: {nxt - ts:.1f}s", flush=True)
        print(
            f"insert {N_UPD}: add {t_add - t0:.2f}s  incremental build "
            f"{t_build - t_add:.2f}s",
            flush=True,
        )
        up1, down1 = tunnel_probe()
        degraded = up1 < _MIN_UP_MBPS or down1 < _MIN_DOWN_MBPS
        if degraded and attempt == 0:
            print(
                f"DEGRADED TUNNEL during cold insert (up {up1:.1f}, down "
                f"{down1:.1f} MB/s) - annotating and retrying the phase once "
                "on a fresh copy",
                flush=True,
            )
            shutil.rmtree(WORK, ignore_errors=True)
            shutil.copytree(SRC, WORK)
            db = Database(WORK)
            w = Writer(db, 0, D)
            continue
        if degraded:
            print(
                f"NOTE: tunnel still degraded (up {up1:.1f}, down {down1:.1f} "
                "MB/s) - the cold-insert figure above reflects tunnel "
                "weather, not engine cost",
                flush=True,
            )
        break
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    got = r.nns(5).by_item(int(new_ids[0]))
    assert got and got[0][0] == int(new_ids[0]) or got[0][1] <= 1e-5
    print(f"post-insert: {r.n_items()} items, validity OK", flush=True)

    # warm round: same process => compiled kernels + device mirror are hot;
    # this is the steady-state cost of an incremental insert batch
    n2 = N_UPD // 2
    x2 = np.where(mask[:n2], parents[pa[:n2]], parents[pb[:n2]]).astype(np.float32)
    x2 += 0.03 * rng.standard_normal((n2, D)).astype(np.float32)
    ids2 = np.arange(m0 + N_UPD, m0 + N_UPD + n2, dtype=np.uint32)
    t0 = time.perf_counter()
    with db.write() as t:
        w.add_items(t, ids2, x2)
        t_add = time.perf_counter()
        w.builder(seed=101).n_trees(n_trees).build(t)
        t_build = time.perf_counter()
    print(
        f"insert {n2} (warm): add {t_add - t0:.2f}s  incremental build "
        f"{t_build - t_add:.2f}s",
        flush=True,
    )
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    print(f"post-insert2: {r.n_items()} items, validity OK", flush=True)

    del_ids = rng.choice(m0 + N_UPD, size=N_UPD, replace=False).astype(np.uint32)
    t0 = time.perf_counter()
    with db.write() as t:
        w.del_items(t, del_ids)
        t_del = time.perf_counter()
        w.builder(seed=100).n_trees(n_trees).build(t)
        t_build = time.perf_counter()
    print(
        f"delete {N_UPD}: mark {t_del - t0:.2f}s  incremental build "
        f"{t_build - t_del:.2f}s",
        flush=True,
    )
    r = Reader.open(db.read(), 0, db)
    r.assert_validity()
    print(f"post-delete: {r.n_items()} items, validity OK", flush=True)


if __name__ == "__main__":
    main()
