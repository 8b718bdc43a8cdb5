"""Fast Mosaic compile probe for the Pallas traversal kernel.

Compiles (and once-runs) the kernel on the real TPU with tiny mock
shapes — minutes instead of a full index build per iteration when
chasing Mosaic lowering/layout errors.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from arroy_tpu.metrics import Euclidean  # noqa: E402
from arroy_tpu.ops.pallas_traverse import make_init_node, traverse_pallas  # noqa: E402

N_NODES, S_ROWS, T, D, B = 256, 64, 4, 128, 16
SK, W = 64, 32
PMAX = 2 * T + 2 * SK + 64

rng = np.random.default_rng(0)
node_table = jnp.asarray(rng.integers(0, 4, (N_NODES, 8)).astype(np.int32))
normals = jnp.asarray(rng.standard_normal((S_ROWS, D)).astype(np.float32))
aux = jnp.zeros(S_ROWS, jnp.float32)
leaf_off = jnp.zeros(N_NODES, jnp.int32)
leaf_cnt = jnp.ones(N_NODES, jnp.int32)
leaf_items = jnp.arange(512, dtype=jnp.int32)
init = jnp.asarray(make_init_node(np.arange(T, dtype=np.int32), PMAX))
qv = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
qf = jnp.ones(B, jnp.float32)

t0 = time.perf_counter()
out = traverse_pallas(
    Euclidean, SK, PMAX, W, node_table, normals, aux,
    leaf_off, leaf_cnt, leaf_items, init, qv, qf,
    jnp.int32(SK), interpret=False,
)
jax.block_until_ready(out)
print(f"COMPILE+RUN OK in {time.perf_counter() - t0:.1f}s", flush=True)
