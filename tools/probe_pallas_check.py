"""Row-level correctness of the pallas select vs numpy on the REAL TPU."""
import jax, jax.numpy as jnp, numpy as np
from d3feat_tpu.ops.neighbors import radius_neighbors_pallas
import sys
sys.path.insert(0, "/root/repo")
from tests.reference_ops import np_radius_neighbors

rng = np.random.default_rng(0)
n = 1500
pts = (rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 1.2, 0.7])).astype(np.float32)
cap = 2048
padded = np.full((cap, 3), 1.0e6, np.float32); padded[:n] = pts
lens = np.array([n, 0], np.int32)
r, k = 0.25, 48
got, ov = radius_neighbors_pallas(
    jnp.asarray(padded), jnp.asarray(padded), jnp.asarray(lens), jnp.asarray(lens),
    r, max_k=k, num_clouds=2, query_tile=256, band_cap=1024)
got = np.asarray(got)[:n]
got = np.where(got == cap, n, got)
ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
bad = 0
for i in range(n):
    if set(got[i]) - {n} != set(ref[i]) - {n}:
        if bad < 3:
            print(f"row {i}: got {sorted(set(got[i])-{n})[:6]} ref {sorted(set(ref[i])-{n})[:6]}")
        bad += 1
print(f"overflow={bool(ov)} mismatched rows: {bad}/{n}")
# ordering check
order_bad = 0
for i in range(n):
    v = got[i][got[i] < n]
    d = np.linalg.norm(pts[v] - pts[i], axis=1)
    if not (np.diff(d) >= -1e-6).all():
        order_bad += 1
print(f"misordered rows: {order_bad}/{n}")
