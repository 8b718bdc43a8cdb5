"""AOT memory probe for the builder level step (no device arrays needed).

Lowers `_level_step_dev` at the exact shapes of a failing build and
prints the compiled program's memory analysis — the missing half of a
runtime RESOURCE_EXHAUSTED whose compile-time check passed (the AOT
relay validates program+args in isolation; it cannot see the other
live buffers).

    python scripts/memprobe_levelstep.py [n_slots] [d] [p_pad] [g_cap] [f_cap]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from arroy_tpu import builder
from arroy_tpu.metrics import metric_by_name

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_327_104
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
P = int(sys.argv[3]) if len(sys.argv) > 3 else 16_777_216
G = int(sys.argv[4]) if len(sys.argv) > 4 else 131_072
F = int(sys.argv[5]) if len(sys.argv) > 5 else G

metric = metric_by_name("euclidean")
sd = D

S = jax.ShapeDtypeStruct
args = (
    S((N, sd), jnp.float32),   # rows
    S((N,), jnp.float32),      # extras
    S((N,), jnp.float32),      # hnorms
    S((P,), jnp.int32),        # perm
    S((G,), jnp.int32),        # seg_start
    S((G,), jnp.int32),        # seg_len
    S((G,), jnp.bool_),        # seg_split
    S((), jnp.int32),          # g_live
    S((), jnp.int32),          # data_end
    jax.random.key(0),  # key (concrete: typed-key ShapeDtypeStructs are awkward)
)

lowered = builder._level_step_dev.lower(
    metric, D, D, *args, f_cap=F
)
print("lowered; compiling...", flush=True)
compiled = lowered.compile()
ma = compiled.memory_analysis()
print(ma)
for name in dir(ma):
    if name.startswith("_"):
        continue
    try:
        v = getattr(ma, name)
    except Exception:
        continue
    if isinstance(v, int):
        print(f"{name}: {v / (1 << 30):.2f} GiB")
