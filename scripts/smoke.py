"""Developer smoke test: build + query end-to-end on CPU."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import numpy as np

from arroy_tpu import Database, Reader, Writer

rng = np.random.default_rng(0)
M, D = 500, 32
X = rng.standard_normal((M, D)).astype(np.float32)

db = Database()
w = Writer(db, 0, D, metric="euclidean")
with db.write() as wtxn:
    for i in range(M):
        w.add_item(wtxn, i, X[i])
    w.builder(seed=42).n_trees(8).build(wtxn)

rtxn = db.read()
r = Reader.open(rtxn, 0, db, metric="euclidean")
print("n_items", r.n_items(), "n_trees", r.n_trees())
r.assert_validity()
print("validity ok")

res = r.nns(10).by_item(0)
print("nns by_item(0):", res[:5])
assert res[0][0] == 0 and abs(res[0][1]) < 1e-5, res[0]

# exhaustive search_k must equal brute force
res_full = r.nns(10).search_k(10_000_000).by_vector(X[1])
exact = r.exact_by_vectors(X[1][None], 10)[0]
print("ann :", [i for i, _ in res_full])
print("exact:", [i for i, _ in exact])
assert [i for i, _ in res_full] == [i for i, _ in exact], "exhaustive != exact"

# recall at default search_k
Q = X[:50]
got = r.nns(10).search_k(8 * 10 * 20).by_vectors(Q)
ex = r.exact_by_vectors(Q, 10)
rec = np.mean([
    len(set(i for i, _ in g) & set(i for i, _ in e)) / 10 for g, e in zip(got, ex)
])
print("recall@10:", rec)
assert rec > 0.85, rec
print("SMOKE OK")
