"""Binary-search the compile explosion inside the real banded function."""
import time
import jax, jax.numpy as jnp, numpy as np
from d3feat_tpu.ops.subsample import lengths_to_cloud_ids

N, T, BAND, K, B = 16384, 512, 2048, 40, 2
_INF = jnp.float32(3.0e38)
_BINS = 1 << 20

pts = jax.random.normal(jax.random.key(0), (N, 3))
lens = jnp.array([15000, 0], jnp.int32)

def ct(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

def banded(real_pre, real_body):
    def fn(queries, lengths):
        nq = ns = N
        shadow = jnp.int32(ns)
        r = jnp.float32(0.075); r2 = r * r
        q_cid = lengths_to_cloud_ids(lengths, nq)
        s_cid = q_cid
        q_valid = q_cid < B; s_valid = s_cid < B
        if real_pre:
            big = jnp.float32(3.0e37)
            def seg_ext(p, cid, valid):
                cidc = jnp.minimum(cid, B - 1)
                lo = jax.ops.segment_min(jnp.where(valid[:,None], p, big), cidc, num_segments=B)
                hi = jax.ops.segment_max(jnp.where(valid[:,None], p, -big), cidc, num_segments=B)
                return lo, hi
            qlo, qhi = seg_ext(queries, q_cid, q_valid)
            lo_c = qlo; hi_c = qhi
            axis_onehot = jax.nn.one_hot(jnp.argmax(hi_c - lo_c, axis=1), 3, dtype=jnp.float32)
            origin = jnp.sum(lo_c * axis_onehot, axis=1)
            def keys_of(p, cid, valid):
                cidc = jnp.minimum(cid, B - 1)
                proj = jnp.sum(p * axis_onehot[cidc], axis=1) - origin[cidc]
                b_ = jnp.clip(jnp.floor(proj / r).astype(jnp.int32), 0, _BINS - 2)
                key = cid.astype(jnp.int32) * _BINS + b_
                return jnp.where(valid, key, B * _BINS + _BINS - 2)
            q_key = keys_of(queries, q_cid, q_valid)
        else:
            q_key = (queries[:, 2] / r).astype(jnp.int32)
        s_key = q_key
        qord = jnp.argsort(q_key); sord = jnp.argsort(s_key)
        qk = q_key[qord]; sk = s_key[sord]
        qs = queries.astype(jnp.float32)[qord]
        qcid_s = jnp.where(q_valid, q_cid, -1)[qord]
        ss = queries.astype(jnp.float32)[sord]
        scid_s = s_cid[sord]
        sidx_s = sord.astype(jnp.int32)
        ss_pad = jnp.concatenate([ss, jnp.full((BAND, 3), jnp.float32(1e6))], axis=0)
        scid_pad = jnp.concatenate([scid_s, jnp.full((BAND,), B, jnp.int32)])
        sidx_pad = jnp.concatenate([sidx_s, jnp.full((BAND,), shadow, jnp.int32)])
        total_q = jnp.maximum(jnp.sum(lengths), 1).astype(jnp.float32)
        center = jnp.sum(jnp.where(q_valid[:,None], queries, 0.0), axis=0) / total_q
        qs_c = jnp.where((qcid_s >= 0)[:,None], qs - center, 0.0)
        ss_c = jnp.where((scid_pad < B)[:,None], ss_pad - center, 0.0)
        qk_p = qk; qc_p = qs_c; qcid_p = qcid_s
        n_tiles = N // T
        def one_tile(args):
            tkeys, qt, qt_cid = args
            valid_t = qt_cid >= 0
            kmin = jnp.min(jnp.where(valid_t, tkeys, jnp.int32(2**30)))
            kmax = jnp.max(jnp.where(valid_t, tkeys, jnp.int32(-1)))
            lo = jnp.searchsorted(sk, kmin - 1)
            hi = jnp.searchsorted(sk, kmax + 2)
            overflow_t = (hi - lo) > BAND
            band = jax.lax.dynamic_slice(ss_c, (lo, 0), (BAND, 3))
            band_cid = jax.lax.dynamic_slice(scid_pad, (lo,), (BAND,))
            band_idx = jax.lax.dynamic_slice(sidx_pad, (lo,), (BAND,))
            q_sq = jnp.sum(qt * qt, axis=1)
            b_sq = jnp.sum(band * band, axis=1)
            d2 = q_sq[:, None] - 2.0 * (qt @ band.T) + b_sq[None, :]
            if real_body:
                same = qt_cid[:, None] == band_cid[None, :]
                d2 = jnp.where(same, d2, _INF)
                _, sel = jax.lax.top_k(-d2, K)
                cand = jnp.take(band, sel.reshape(-1), axis=0).reshape(T, K, 3)
                diff = cand - qt[:, None, :]
                d2e = jnp.sum(diff * diff, axis=-1)
                keep = jnp.take_along_axis(same, sel, axis=1) & (d2e <= r2)
                d2e = jnp.where(keep, d2e, _INF)
                rank = jnp.argsort(d2e, axis=1)
                sel = jnp.take_along_axis(sel, rank, axis=1)
                keep = jnp.take_along_axis(keep, rank, axis=1)
                idx = jnp.take(band_idx, sel.reshape(-1)).reshape(T, K)
                idx = jnp.where(keep, idx, shadow)
            else:
                _, sel = jax.lax.top_k(-d2, K)
                idx = sel
            return idx.astype(jnp.int32), overflow_t
        out, ovs = jax.lax.map(one_tile, (qk_p.reshape(n_tiles, T),
                                          qc_p.reshape(n_tiles, T, 3),
                                          qcid_p.reshape(n_tiles, T)))
        out = out.reshape(-1, K)[:nq]
        inv = jnp.argsort(qord)
        return out[inv], jnp.any(ovs)
    return fn

ct("pre=min body=real", banded(False, True), pts, lens)
ct("pre=real body=min", banded(True, False), pts, lens)
ct("pre=real body=real", banded(True, True), pts, lens)
