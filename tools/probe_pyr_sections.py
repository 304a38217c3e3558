"""Pyramid section costs via cumulative FUSED programs (one dispatch each).

stage 0: frame + sorted levels only
stage 1: + subsamples
stage 2: + conv selects
stage 3: + pool selects
stage 4: + upsample selects        (== full pyramid)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_fragments
from d3feat_tpu.data.synthetic import scan_fragment
from d3feat_tpu.ops.neighbors import (SortedLevel, make_level_frame,
                                      radius_neighbors_sorted, radius_neighbors)
from d3feat_tpu.ops.pyramid import make_pyramid_spec, level_band_cap
from d3feat_tpu.ops.subsample import voxel_subsample

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40,)*5, corr=128)
spec = make_pyramid_spec(cfg, num_clouds=2)
rng = np.random.default_rng(0)
f = scan_fragment(rng)
while not (14000 <= len(f) <= 15500):
    f = scan_fragment(rng)
b = pack_fragments([f], point_capacity=16384, num_clouds=2)
PTS, LENS = jnp.asarray(b["points"]), jnp.asarray(b["lengths"])
R0 = 0.075
L = 5

def pyramid_stage(pts, lens, stage):
    ax, og = make_level_frame(pts, lens, 2)
    outs = []
    cur, curl = pts, lens
    lvls = []
    for l in range(L):
        rows = cur.shape[0]
        ratio_l = 1 if l+1 >= L else -(-spec.point_caps[l]//spec.point_caps[l+1])
        pad = max(level_band_cap(rows, 2, 0.1, tile=256, ratio=1),
                  level_band_cap(rows, 2, 0.1, tile=128, ratio=ratio_l))
        lv = SortedLevel(cur, curl, 2, ax, og, band_pad=pad)
        lvls.append(lv)
        outs.append(lv.s_packed)
        if stage >= 1 and l + 1 < L:
            r = R0 * 2**l
            sub = voxel_subsample(cur, curl, 2.0*r/2.5,
                                  out_capacity=spec.point_caps[l+1],
                                  num_clouds=2,
                                  occupancy_cap=64 if l == 0 else 32)
            cur, curl = sub.points, sub.lengths
            outs.append(cur)
    if stage >= 2:
        for l in range(L):
            lv = lvls[l]
            r = R0 * 2**l
            if lv.n > 4096:
                cap = level_band_cap(lv.n, 2, 0.1, tile=256, ratio=1)
                idx, _ = radius_neighbors_sorted(lv, lv, r, max_k=40,
                                                 query_tile=256, band_cap=cap)
            else:
                idx = radius_neighbors(lvls[l].pts_sorted if False else None, None, None, None, r, max_k=40, num_clouds=2) if False else None
            if idx is not None:
                outs.append(idx)
    if stage >= 3:
        for l in range(L - 1):
            lv_s, lv_q = lvls[l], lvls[l+1]
            if lv_s.n <= 4096:
                continue
            r = R0 * 2**l
            ratio = -(-lv_s.n // lv_q.n)
            cap = level_band_cap(lv_s.n, 2, 0.1, tile=128, ratio=ratio)
            idx, _ = radius_neighbors_sorted(lv_q, lv_s, r, max_k=40,
                                             query_tile=128, band_cap=cap)
            outs.append(idx)
    if stage >= 4:
        for l in range(L - 1):
            lv_s, lv_q = lvls[l], lvls[l+1]
            if lv_q.n <= 4096:
                continue
            r = 2 * R0 * 2**l
            cap = level_band_cap(lv_q.n, 2, 0.1, tile=256, ratio=1)
            idx, _ = radius_neighbors_sorted(lv_s, lv_q, r, max_k=1,
                                             query_tile=256, band_cap=cap)
            outs.append(idx)
    return outs

prev = 0.0
for stage in range(5):
    fn = jax.jit(functools.partial(pyramid_stage, stage=stage))
    out = jax.block_until_ready(fn(PTS, LENS))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(PTS, LENS)
    jax.block_until_ready(out)
    ms = (time.perf_counter()-t0)/20*1000
    print(f"stage {stage}: {ms:.2f} ms (delta {ms-prev:+.2f})")
    prev = ms
