"""Ablate the REAL banded implementation piece by piece (compile times)."""
import time
import jax, jax.numpy as jnp, numpy as np

N, T, BAND, K, B = 16384, 512, 2048, 40, 2

pts = jax.random.normal(jax.random.key(0), (N, 3))
lens = jnp.array([15000, 0], jnp.int32)

def ct(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

from d3feat_tpu.ops.subsample import lengths_to_cloud_ids

# piece 1: segment extrema
def seg_ext_only(points, lengths):
    cid = lengths_to_cloud_ids(lengths, N)
    valid = cid < B
    cidc = jnp.minimum(cid, B - 1)
    big = jnp.float32(3e37)
    lo = jax.ops.segment_min(jnp.where(valid[:,None], points, big), cidc, num_segments=B)
    hi = jax.ops.segment_max(jnp.where(valid[:,None], points, -big), cidc, num_segments=B)
    return lo, hi
ct("segment min/max x2", seg_ext_only, pts, lens)

# piece 2: one_hot axis + keys
def keys_only(points, lengths):
    cid = lengths_to_cloud_ids(lengths, N)
    oh = jax.nn.one_hot(jnp.argmax(points[:B], axis=1), 3, dtype=jnp.float32)
    cidc = jnp.minimum(cid, B-1)
    proj = jnp.sum(points * oh[cidc], axis=1)
    return jnp.clip(jnp.floor(proj / 0.075).astype(jnp.int32), 0, (1<<20)-2)
ct("cloud ids + onehot keys", keys_only, pts, lens)

# piece 3: two-output lax.map with scalar second output
def two_out_map(points, lengths):
    def one(qt):
        d2 = qt @ points[:BAND].T
        _, sel = jax.lax.top_k(-d2, K)
        return sel.astype(jnp.int32), jnp.any(sel > 100)
    a, b = jax.lax.map(one, points.reshape(-1, T, 3))
    return a, jnp.any(b)
ct("two-output lax.map", two_out_map, pts, lens)

# piece 4: cid compare inside map ([T] == [BAND] broadcast)
def cid_map(points, lengths):
    cid = lengths_to_cloud_ids(lengths, N)
    def one(args):
        qt, qc = args
        d2 = qt @ points[:BAND].T
        same = qc[:, None] == cid[:BAND][None, :]
        d2 = jnp.where(same, d2, 3e38)
        _, sel = jax.lax.top_k(-d2, K)
        return sel.astype(jnp.int32)
    return jax.lax.map(one, (points.reshape(-1, T, 3), cid.reshape(-1, T)))
ct("cid broadcast compare in map", cid_map, pts, lens)

# piece 5: keep/where/pad + take_along_axis combination in map
def keep_map(points, lengths):
    def one(qt):
        band = points[:BAND]
        d2 = qt @ band.T
        _, sel = jax.lax.top_k(-d2, K)
        cand = jnp.take(band, sel.reshape(-1), axis=0).reshape(T, K, 3)
        d2e = jnp.sum((cand - qt[:,None,:])**2, -1)
        keep = d2e <= 0.3
        d2e = jnp.where(keep, d2e, 3e38)
        rank = jnp.argsort(d2e, axis=1)
        sel = jnp.take_along_axis(sel, rank, axis=1)
        keep = jnp.take_along_axis(keep, rank, axis=1)
        return jnp.where(keep, sel, N).astype(jnp.int32)
    return jax.lax.map(one, points.reshape(-1, T, 3))
ct("keep/rank/where in map", keep_map, pts, lens)
