"""End-to-end pyramid parity vs the reference's OWN C++ collate.

Every other parity test covers the reference's grid-subsample / radius-
neighbor semantics at op level against a numpy oracle
(tests/reference_ops.py) — this one compiles the reference's actual
``cpp_wrappers`` extensions (cpp_subsampling.grid_subsampling,
cpp_neighbors.radius_neighbors) in a scratch directory, replays its
``collate_fn_descriptor`` pyramid loop (reference: datasets/
dataloader.py:69-189) on one synthetic fragment pair, and asserts our
jitted ``build_pyramid`` reproduces the same multi-scale structure:

  - identical per-level point sets (grid-barycenter subsampling),
  - identical per-level lengths,
  - identical conv / pool neighbor SETS per matched query point
    (order-invariant: the reference's unordered_map makes subsampled
    point order nondeterministic, and both stacks distance-sort
    neighbors so only the sets are contractual),
  - identical nearest-upsample distances.

Skips cleanly when /root/reference or a C++ toolchain is absent.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
BUILD = "/tmp/ref_cpp_parity_build"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "cpp_wrappers"))
    or shutil.which("g++") is None,
    reason="reference cpp_wrappers or g++ not available",
)


# The reference's setup.py uses numpy.distutils (removed in numpy >= 2);
# a scratch copy gets this C++ shim (the 2014-era wrappers pass PyObject*
# where the modern numpy C API takes PyArrayObject*) and compiles with
# plain g++. The reference tree itself is never modified.
_NUMPY2_SHIM = """
#ifndef NPY_IN_ARRAY
#define NPY_IN_ARRAY NPY_ARRAY_IN_ARRAY
#endif
static inline int PyArray_NDIM(const PyObject* o)
{ return PyArray_NDIM((const PyArrayObject*)o); }
static inline npy_intp PyArray_DIM(const PyObject* o, int i)
{ return PyArray_DIM((const PyArrayObject*)o, i); }
static inline void* PyArray_DATA(const PyObject* o)
{ return PyArray_DATA((PyArrayObject*)o); }
"""


@pytest.fixture(scope="module")
def ref_cpp():
    """Build (once) and import the reference's C++ extension modules."""
    import importlib.util
    import sysconfig

    import numpy as np_mod

    if not os.path.isdir(BUILD):
        shutil.copytree(os.path.join(REF, "cpp_wrappers"), BUILD)
        for pkg in ("cpp_neighbors", "cpp_subsampling"):
            w = os.path.join(BUILD, pkg, "wrapper.cpp")
            src = open(w).read()
            inc = "#include <numpy/arrayobject.h>"
            with open(w, "w") as f:
                f.write(src.replace(inc, inc + _NUMPY2_SHIM, 1))
    mods = {}
    for pkg, mod, extra in (
        ("cpp_subsampling", "grid_subsampling",
         "grid_subsampling/grid_subsampling.cpp"),
        ("cpp_neighbors", "radius_neighbors", "neighbors/neighbors.cpp"),
    ):
        pkg_dir = os.path.join(BUILD, pkg)
        so = os.path.join(pkg_dir, f"{mod}.so")
        if not os.path.exists(so):
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++11",
                f"-I{np_mod.get_include()}",
                f"-I{sysconfig.get_paths()['include']}",
                "../cpp_utils/cloud/cloud.cpp", extra, "wrapper.cpp",
                "-o", f"{mod}.so",
            ]
            r = subprocess.run(cmd, cwd=pkg_dir, capture_output=True,
                               text=True, timeout=600)
            if r.returncode != 0:
                pytest.skip(f"reference {pkg} build failed: {r.stderr[-500:]}")
        spec = importlib.util.spec_from_file_location(mod, so)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        mods[mod] = m
    return mods


def _ref_collate(cpp, points0, points1, num_layers, dl, conv_radius, limit):
    """The reference collate pyramid loop (dataloader.py:84-189) in numpy,
    for the default (non-deformable) D3Feat architecture
    (training_3DMatch.py:44-56: per layer 'resnetb_strided'+2x'resnetb',
    so every level computes conv neighbors and all but the last pool)."""
    sub = cpp["grid_subsampling"]
    nei = cpp["radius_neighbors"]
    pts = np.concatenate([points0, points1]).astype(np.float32)
    lens = np.array([len(points0), len(points1)], np.int32)
    r = dl * conv_radius

    out = {"points": [], "lengths": [], "neighbors": [], "pools": [],
           "upsamples": []}
    for layer in range(num_layers):
        conv_i = nei.batch_query(pts, pts, lens, lens, radius=r)[:, :limit]
        if layer < num_layers - 1:
            pool_p, pool_b = sub.subsample_batch(
                pts, lens, sampleDl=2 * r / conv_radius, max_p=0, verbose=0)
            pool_i = nei.batch_query(
                pool_p, pts, pool_b, lens, radius=r)[:, :limit]
            up_i = nei.batch_query(
                pts, pool_p, lens, pool_b, radius=2 * r)[:, :limit]
        else:
            pool_p = pool_b = pool_i = up_i = None
        out["points"].append(pts)
        out["lengths"].append(lens)
        out["neighbors"].append(conv_i)
        out["pools"].append(pool_i)
        out["upsamples"].append(up_i)
        if pool_p is None:
            break
        pts, lens = pool_p, pool_b
        r *= 2
    return out


def _segments(lengths):
    offs = np.concatenate([[0], np.cumsum(lengths)])
    return [(int(offs[i]), int(offs[i + 1])) for i in range(len(lengths))]


def _match_points(ours, ref, tol=5e-5):
    """our row -> ref row bijection by nearest neighbor (same cloud)."""
    from scipy.spatial import cKDTree

    d, idx = cKDTree(ref).query(ours, k=1)
    assert float(d.max()) < tol, f"point sets differ: max dist {d.max()}"
    assert len(np.unique(idx)) == len(ref) == len(ours), "not a bijection"
    return idx


def _neighbor_sets(rows, shadow, to_ref):
    """list of frozensets of REF support indices, shadow dropped."""
    sets = []
    for row in rows:
        valid = row[row != shadow]
        sets.append(frozenset(int(to_ref[i]) for i in valid))
    return sets


def test_build_pyramid_matches_reference_cpp_collate(ref_cpp):
    from d3feat_tpu.config import D3FeatConfig, PyramidCaps
    from d3feat_tpu.data.pack import pack_pair
    from d3feat_tpu.data.synthetic import scan_pair
    from d3feat_tpu.ops import build_pyramid, make_pyramid_spec

    rng = np.random.default_rng(31)
    dl = 0.03
    pts0, pts1, _corr, _dk = scan_pair(rng, resolution=(64, 48),
                                       num_corr=64, downsample=dl)
    # keep the CPU jit small: thin each cloud to <= 2500 pts (the pyramid
    # does not consume corr, so dummy correspondences suffice)
    pts0 = pts0[rng.permutation(len(pts0))[:2500]]
    pts1 = pts1[rng.permutation(len(pts1))[:2500]]
    corr = np.zeros((8, 2), np.int32)
    dk = np.zeros((8, 8), np.float32)

    LIMIT = 128  # far above the true max neighborhood: no truncation
    cfg = D3FeatConfig()
    n_total = len(pts0) + len(pts1)
    # generous per-level capacities: any truncation would break parity by
    # construction (grid subsampling only removes ~2x per level here)
    cfg.caps = PyramidCaps(
        points=(n_total, n_total, 2048, 1024, 512),
        neighbors=(LIMIT,) * 5, corr=64)
    cfg.query_tile = 256
    cfg.neighbor_search = "banded"

    ref = _ref_collate(ref_cpp, pts0, pts1, cfg.num_layers, dl,
                       cfg.conv_radius, LIMIT)

    spec = make_pyramid_spec(cfg)
    batch = pack_pair(pts0, pts1, np.ones((len(pts0), 1), np.float32),
                      np.ones((len(pts1), 1), np.float32), corr, dk,
                      point_capacity=cfg.caps.points[0], corr_capacity=64)
    import jax.numpy as jnp

    pyr = build_pyramid(jnp.asarray(batch.points),
                        jnp.asarray(batch.lengths), spec=spec)
    pyr = {k: ([np.asarray(v) for v in vs] if isinstance(vs, list) else vs)
           for k, vs in pyr.items() if k in
           ("points", "lengths", "neighbors", "pools", "upsamples")}

    L = cfg.num_layers
    match = []  # per level: our valid row -> ref row
    for l in range(L):
        ref_len = ref["lengths"][l]
        our_len = np.asarray(pyr["lengths"][l])
        np.testing.assert_array_equal(our_len, ref_len,
                                      err_msg=f"lengths L{l}")
        n = int(our_len.sum())
        to_ref = np.full(n, -1, np.int64)
        for (oa, ob), (ra, rb) in zip(_segments(our_len),
                                      _segments(ref_len)):
            to_ref[oa:ob] = ra + _match_points(
                np.asarray(pyr["points"][l])[oa:ob],
                ref["points"][l][ra:rb])
        match.append(to_ref)

    for l in range(L):
        n = int(np.asarray(pyr["lengths"][l]).sum())
        shadow_ours = np.asarray(pyr["points"][l]).shape[0]
        n_ref = len(ref["points"][l])
        ours = _neighbor_sets(
            np.asarray(pyr["neighbors"][l])[:n], shadow_ours, match[l])
        refs = _neighbor_sets(ref["neighbors"][l], n_ref,
                              np.arange(n_ref))
        for i in range(n):
            assert ours[i] == refs[match[l][i]], \
                f"conv neighbor set differs at L{l} row {i}"

        if l + 1 < L:
            nq = int(np.asarray(pyr["lengths"][l + 1]).sum())
            ours_p = _neighbor_sets(
                np.asarray(pyr["pools"][l])[:nq], shadow_ours, match[l])
            refs_p = _neighbor_sets(ref["pools"][l], n_ref,
                                    np.arange(n_ref))
            for i in range(nq):
                assert ours_p[i] == refs_p[match[l + 1][i]], \
                    f"pool neighbor set differs at L{l} row {i}"

            # upsample: ours stores only the nearest level-(l+1) point;
            # the reference stores the 2r-radius list distance-sorted, so
            # its column 0 is the nearest. Ties dodge index comparison:
            # compare nearest DISTANCES.
            up_ours = np.asarray(pyr["upsamples"][l])[:n, 0]
            q = np.asarray(pyr["points"][l])[:n]
            sup = np.asarray(pyr["points"][l + 1])
            d_ours = np.linalg.norm(q - sup[up_ours], axis=1)
            # per OUR row i, the matched ref row and its nearest support
            j = match[l][:n]
            ref_up_j = ref["upsamples"][l][:, 0][j]
            # a query with NO 2r neighbor gets the shadow in the reference;
            # ours always reports the true nearest — compare where defined
            has = ref_up_j != len(ref["points"][l + 1])
            d_ref = np.linalg.norm(
                ref["points"][l][j[has]]
                - ref["points"][l + 1][ref_up_j[has]], axis=1)
            np.testing.assert_allclose(d_ours[has], d_ref, atol=1e-5)
