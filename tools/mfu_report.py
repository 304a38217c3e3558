"""MFU / roofline accounting for the serving extract pipeline.

Per pipeline section: measured device time (perfetto trace of the warm
extract step), analytic FLOPs and HBM bytes computed from the REAL band
occupancies of the bench fragment (not static caps), achieved TFLOP/s and
GB/s, and percent of the per-section roofline bound. One honest table +
the overall single-chip MFU.

Peaks (TPU v5e, one chip): 197 TFLOP/s bf16 MXU (f32 dots run at bf16
rate under --xla_allow_excess_precision, ROUND2_NOTES bf16 section),
~819 GB/s HBM.

Run on the chip: python tools/mfu_report.py      (writes MFU.md)
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_fragments
from d3feat_tpu.data.synthetic import scan_fragment
from d3feat_tpu.models.kpfcnn import make_kpfcnn_specs
from d3feat_tpu.models.blocks import band_conv_eligible, band_query_tiles
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec
from d3feat_tpu.ops.pallas.band_conv import _pick_chunk
from d3feat_tpu.ops.pyramid import level_band_cap
from d3feat_tpu.train.step import init_train_state, make_extract_step

PEAK_FLOPS = 197e12   # bf16 MXU, one v5e chip
PEAK_BW = 819e9       # HBM GB/s
# VPU f32 elementwise peak: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz.
# Not published per-chip the way MXU peaks are — treated as an estimate;
# used only for sections whose work is selection/sweep VPU arithmetic.
PEAK_VPU = 3.9e12
STEPS = 5

# ---------------------------------------------------------------- analytic


def band_conv_cost(spec, pyr, cfg, num_clouds):
    """(mxu_flops, hbm_bytes, vpu_ops) of one fused band conv from REAL
    occupancies.

    The kernel is VPU-bound, not MXU-bound (ROUND2_NOTES bf16 section):
    per band chunk the threshold selection costs ~14 elementwise passes
    over the [CHUNK, T] panel and each kernel point's influence chain
    (two broadcast adds + clamp + sqrt + FMA + clamp, sqrt weighted ~3x)
    ~8 more, so the real per-section bound is the max of the MXU, HBM
    and VPU terms."""
    l = spec.layer
    q_level = l + 1 if spec.strided else l
    qb = {k: np.asarray(v) for k, v in pyr["band"][q_level].items()}
    sb = {k: np.asarray(v) for k, v in pyr["band"][l].items()}
    s_rows = sb["s_packed"].shape[0]
    T = 128 if spec.strided else 256
    r = spec.radius
    qp, starts, ends, _, _, _ = band_query_tiles(
        {k: jnp.asarray(v) for k, v in qb.items()},
        {k: jnp.asarray(v) for k, v in sb.items()},
        num_clouds, r, T, s_rows)
    starts = (np.asarray(starts) // 8) * 8
    ratio = max(1, -(-sb["q_packed"].shape[1] // qb["q_packed"].shape[1]))
    cap = level_band_cap(s_rows - (s_rows % 8), num_clouds,
                         getattr(cfg, "band_frac", 0.1), tile=T, ratio=ratio)
    chunk = _pick_chunk(cap)
    ends = np.clip(np.asarray(ends), starts, starts + cap)
    n_chunks = np.ceil((ends - starts) / chunk).astype(np.int64)

    if spec.kind == "simple":
        cin, cout = spec.in_dim, spec.out_dim // 2
    else:
        cin = cout = spec.out_dim // 4
    cin_p = -(-cin // 128) * 128
    kp = cfg.num_kernel_points
    rows = int(n_chunks.sum()) * chunk          # band rows processed
    # per chunk per kp: [T, CHUNK] @ [CHUNK, Cpad] and [T, Cpad] @ [Cpad, Cout]
    flops = 2 * kp * (rows * T * cin_p + int(n_chunks.sum()) * T * cin_p * cout)
    # DMA: coords [CHUNK,128] f32 + features [CHUNK,Cpad] f32 per chunk
    bytes_ = rows * (128 + cin_p) * 4
    # VPU: ~14 selection passes + ~8 influence passes per kp, all at
    # [CHUNK, T] (see docstring)
    vpu = rows * T * (14 + 8 * kp)
    return flops, bytes_, vpu


def select_cost(pyr, cfg, num_clouds):
    """(vpu_ops, hbm_bytes) of ALL fused band-select searches.

    The select kernel is VPU-bound, not MXU-bound: per band chunk it does
    ~12 elementwise ops per [CHUNK, T] element for the exact distances +
    masking, then k_dyn argmin-extraction sweeps of ~8 ops each over the
    same panel. Rows come from the REAL per-tile band windows; the sweep
    count per tile is approximated by the tile's max ACTUAL neighbor
    count (each sweep extracts exactly one candidate, so the per-chunk
    sweep total is >= the tile max and <= max + n_chunks; we add the
    n_chunks slack). DMA bytes: each band row is one [128]-lane f32 row.
    """
    L = len(pyr["lengths"])
    searches = []
    for l in range(L):
        r = cfg.first_subsampling_dl * cfg.conv_radius * (2.0 ** l)
        searches.append((l, l, r, pyr["neighbors"][l]))
        if l + 1 < L:
            searches.append((l + 1, l, r, pyr["pools"][l]))
            searches.append((l, l + 1, 2.0 * r, pyr["upsamples"][l]))
    flops = bytes_ = 0
    for q_level, s_level, r, lists in searches:
        qb = pyr["band"][q_level]
        sb = pyr["band"][s_level]
        s_rows = np.asarray(sb["s_packed"]).shape[0]
        nq = np.asarray(qb["q_packed"]).shape[1]
        ratio = max(1, -(-s_rows // nq))
        qt = 128 if (ratio > 1 or s_rows < 256) else 256
        _, starts, ends, _, _, _ = band_query_tiles(
            {k: jnp.asarray(v) for k, v in qb.items()},
            {k: jnp.asarray(v) for k, v in sb.items()},
            num_clouds, r, qt, s_rows)
        starts = (np.asarray(starts) // 8) * 8
        cap = level_band_cap(s_rows, num_clouds,
                             getattr(cfg, "band_frac", 0.1),
                             tile=qt, ratio=ratio)
        chunk = _pick_chunk(cap)
        ends = np.clip(np.asarray(ends), starts, starts + cap)
        n_chunks = np.ceil((ends - starts) / chunk).astype(np.int64)
        rows = int(n_chunks.sum()) * chunk
        flops += rows * qt * 12                      # distances + masking
        # actual neighbor counts -> sweep estimate per tile
        arr = np.asarray(lists)
        shadow = arr.max()                           # empty marker
        counts = (arr != shadow).sum(axis=1)         # [nq_real]
        counts = np.pad(counts, (0, (-len(counts)) % qt))
        per_tile = counts.reshape(-1, qt).max(axis=1)
        sweeps = int(per_tile.sum()) + int(n_chunks.sum())
        # per sweep: one [chunk, qt] panel of ~8 ops (the sweep runs on
        # whichever single chunk is live, so chunk x qt per sweep)
        flops += sweeps * chunk * qt * 8
        bytes_ += rows * 128 * 4
    return flops, bytes_


def xla_conv_cost(spec, lengths, cfg):
    """(flops, bytes) of one XLA gather-path conv (deep levels)."""
    l = spec.layer
    q_level = l + 1 if spec.strided else l
    nq = int(np.sum(lengths[q_level]))
    k = cfg.caps.neighbors[l]
    if spec.kind == "simple":
        cin, cout = spec.in_dim, spec.out_dim // 2
    else:
        cin = cout = spec.out_dim // 4
    kp = cfg.num_kernel_points
    flops = 2 * nq * kp * k * cin + 2 * nq * kp * cin * cout
    bytes_ = nq * k * cin * 4 * 2  # gather read + weighted write (approx)
    return flops, bytes_


def unary_cost(spec, lengths):
    n = int(np.sum(lengths[spec.layer]))
    return 2 * n * spec.in_dim * spec.out_dim, n * (spec.in_dim + spec.out_dim) * 4


# ---------------------------------------------------------------- buckets

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _line_span(relpath, start_pat, end_pat):
    """1-based [start, end] line span in ``relpath`` from the first line
    matching start_pat through the next line matching end_pat. Buckets
    keyed on source LINES (the eval gate / max_pool live inside files
    whose other lines belong to different buckets) must not go stale when
    the file is edited — round 4's hardcoded ranges did exactly that."""
    lines = open(os.path.join(_REPO, relpath)).read().splitlines()
    start = next(i for i, ln in enumerate(lines, 1) if re.search(start_pat, ln))
    end = next(i for i, ln in enumerate(lines[start - 1:], start)
               if re.search(end_pat, ln))
    return start, end


# buckets resolved by (file, line-span) — checked before the regex buckets
SPAN_BUCKETS = (
    ("eval local-max gate", "d3feat_tpu/models/kpfcnn.py",
     _line_span("d3feat_tpu/models/kpfcnn.py",
                r"topm = getattr\(config", r"scores = scores \* detected")),
    ("shortcut max_pool", "d3feat_tpu/models/blocks.py",
     _line_span("d3feat_tpu/models/blocks.py",
                r"def closest_pool", r"return jnp\.max\(gathered")),
)

BUCKETS = (
    ("band_conv kernels", r"band_conv\.py"),
    ("select kernels", r"select\.py"),
    ("detector head kernel", r"head\.py"),
    ("voxel subsample", r"subsample\.py"),
    ("level sorts + search misc", r"neighbors\.py"),
    ("XLA convs (deep)", r"kpconv\.py"),
    ("unary / linear", r"blocks\.py"),
    ("detector head (XLA part)", r"kpfcnn\.py"),
)


def bucket_of(src):
    m = re.match(r"(.+\.py):(\d+)$", src)
    if m:
        base, line = m.group(1), int(m.group(2))
        for name, relpath, (lo, hi) in SPAN_BUCKETS:
            if os.path.basename(relpath) == base and lo <= line <= hi:
                return name
    for name, pat in BUCKETS:
        if re.search(pat, src):
            return name
    return "other"


B = 2  # fragments per call — bench.py's FRAGS_PER_CALL default


def main():
    # EXACTLY bench.py's operating point (caps, query tile, top-M eval
    # gate, B=2 batching) so the table attributes the headline number,
    # not a neighboring configuration
    cfg = D3FeatConfig()
    cfg.caps = PyramidCaps(points=(16384 * B, 8192 * B, 2048 * B,
                                   768 * B, 256 * B),
                           neighbors=(40,) * 5, corr=128)
    cfg.query_tile = 512
    cfg.eval_gate_topm = 16 * 250 * B

    rng = np.random.default_rng(0)

    def fragment():
        f = scan_fragment(rng)
        while not (12000 <= len(f) <= 16000):
            f = scan_fragment(rng)
        return f

    b = pack_fragments([fragment() for _ in range(B)],
                       point_capacity=16384 * B, num_clouds=max(2, B))
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    # ---- analytic FLOPs/bytes from the real pyramid
    spec = make_pyramid_spec(cfg, num_clouds=2)
    pyr = dict(build_pyramid(batch["points"], batch["lengths"], spec=spec))
    assert not bool(pyr["overflow"])
    lengths = [np.asarray(ln) for ln in pyr["lengths"]]
    specs = make_kpfcnn_specs(cfg)

    ana = defaultdict(lambda: [0, 0, 0])  # bucket -> [mxu_flops, bytes, vpu]
    for s in list(specs.encoder) + list(specs.decoder):
        if s.kind in ("simple", "resnetb"):
            if band_conv_eligible(s, pyr, cfg, train=False):
                fl, by, vp = band_conv_cost(s, pyr, cfg, 2)
                ana["band_conv kernels"][0] += fl
                ana["band_conv kernels"][1] += by
                ana["band_conv kernels"][2] += vp
            else:
                fl, by = xla_conv_cost(s, lengths, cfg)
                ana["XLA convs (deep)"][0] += fl
                ana["XLA convs (deep)"][1] += by
            # resnetb unaries (in->out/4, out/4->out, shortcut)
            if s.kind == "resnetb":
                n_in = int(np.sum(lengths[s.layer]))
                n_out = int(np.sum(lengths[s.layer + 1 if s.strided
                                           else s.layer]))
                c4 = s.out_dim // 4
                fl = (2 * n_in * s.in_dim * c4 + 2 * n_out * c4 * s.out_dim
                      + (2 * n_out * s.in_dim * s.out_dim
                         if s.in_dim != s.out_dim else 0))
                ana["unary / linear"][0] += fl
                by = (n_in * (s.in_dim + c4) * 4
                      + n_out * (c4 + s.out_dim) * 4
                      + (n_out * (s.in_dim + s.out_dim) * 4
                         if s.in_dim != s.out_dim else 0))
                ana["unary / linear"][1] += by
        elif s.kind in ("unary", "last_unary"):
            fl, by = unary_cost(s, lengths)
            ana["unary / linear"][0] += fl
            ana["unary / linear"][1] += by

    # fused band-select searches: VPU-op + DMA-byte model (real windows)
    vp, by = select_cost(pyr, cfg, 2)
    ana["select kernels"][2] += vp
    ana["select kernels"][1] += by

    # gate + max_pool + head byte estimates (gather volumes)
    n0 = int(np.sum(lengths[0]))
    k0 = cfg.caps.neighbors[0]
    # top-M gate: [M, K0, D] gather + the [N]-wide top_k + scatter passes
    gate_m = min(cfg.eval_gate_topm or n0, n0)
    ana["eval local-max gate"][1] = gate_m * k0 * 32 * 4 + 3 * n0 * 4
    for s in specs.encoder:
        if s.kind == "resnetb" and s.strided:
            nq = int(np.sum(lengths[s.layer + 1]))
            ana["shortcut max_pool"][1] += nq * cfg.caps.neighbors[s.layer] \
                * s.in_dim * 4
    ana["detector head kernel"][1] = n0 * (128 + 128) * 4  # band DMA approx

    # ---- measured: trace the warm extract step
    ts, _ = init_train_state(jax.random.key(0), cfg)
    extract = jax.jit(make_extract_step(cfg, make_kpfcnn_specs(cfg),
                                        num_clouds=2))
    out = extract(ts.params, ts.model_state, batch)
    jax.block_until_ready(out)

    trace_dir = "/tmp/jtrace_mfu"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(STEPS):
        out = extract(ts.params, ts.model_state, batch)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # join op time with HLO source metadata (same method as profile_agg)
    lowered = extract.lower(ts.params, ts.model_state, batch)
    hlo = lowered.compile().as_text()
    src_of = {}
    for m in re.finditer(
            r'%?([\w.\-]+) = [^\n]*metadata={[^}]*source_file="([^"]+)"'
            r'[^}]*source_line=(\d+)', hlo):
        src_of[m.group(1)] = (os.path.basename(m.group(2))
                              + ":" + m.group(3))

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(files[0]))["traceEvents"]
    meas = defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "Pjit", "$", "ParseArguments")) \
                or "stop_trace" in name:
            continue
        src = src_of.get(name, src_of.get(name.split(".")[0], ""))
        meas[bucket_of(src) if src else "other"] += e["dur"]
        total += e["dur"]

    # per-FRAGMENT figures: the traced call serves B fragments, and the
    # analytic ana[] volumes come from the same B-fragment pyramid
    us = {k: v / (STEPS * B) for k, v in meas.items()}
    total_us = total / (STEPS * B)
    for k in ana:
        ana[k] = [v / B for v in ana[k]]

    rows = []
    tot_fl = tot_by = 0
    for name in [b[0] for b in BUCKETS] + ["other"]:
        t = us.get(name, 0.0)
        fl, by, vp = ana.get(name, (0, 0, 0))
        # MFU numerator counts model (MXU) FLOPs only; VPU selection /
        # influence ops bound their section's roofline but are not MFU
        tot_fl += fl
        tot_by += by
        tf = fl / (t * 1e-6) / 1e12 if t else 0.0
        gb = by / (t * 1e-6) / 1e9 if t else 0.0
        # per-section bound: the slowest of the MXU, HBM and VPU terms
        bound = max(fl / PEAK_FLOPS, by / PEAK_BW, vp / PEAK_VPU) * 1e6
        # no cost model => render 'n/a', not 0.0 (0.0 would read as 'far
        # below roofline' when it actually means 'not modeled')
        modeled = (fl > 0 or by > 0 or vp > 0) and t > 0
        rows.append((name, t, fl / 1e9, by / 1e6, vp / 1e9, tf, gb,
                     100.0 * bound / t if modeled else None))

    hdr = (f"{'section':<28} {'us/frag':>8} {'GFLOP':>7} {'MB':>7} "
           f"{'GVop':>7} {'TFLOP/s':>8} {'GB/s':>7} {'%roofline':>9}")
    lines = [hdr, "-" * len(hdr)]
    for name, t, gfl, mb, gvp, tf, gb, pct in rows:
        pct_s = f"{pct:9.1f}" if pct is not None else f"{'n/a':>9}"
        lines.append(f"{name:<28} {t:8.0f} {gfl:7.2f} {mb:7.1f} "
                     f"{gvp:7.2f} {tf:8.2f} {gb:7.1f} {pct_s}")
    mfu = tot_fl / (total_us * 1e-6) / PEAK_FLOPS * 100.0
    lines.append("-" * len(hdr))
    lines.append(
        f"{'TOTAL':<28} {total_us:8.0f} {tot_fl / 1e9:7.2f} "
        f"{tot_by / 1e6:7.1f}   overall MFU {mfu:.2f}% of bf16 peak")
    table = "\n".join(lines)
    print(table)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "MFU.md"), "w") as fh:
        fh.write(
            "# Single-chip MFU / roofline — serving extract (one ~14k-pt "
            "fragment)\n\n"
            "Measured on TPU v5e (one chip) from a perfetto trace of the "
            "warm extract step;\nFLOPs/bytes computed analytically from "
            "the fragment's REAL band occupancies\n(tools/mfu_report.py). "
            "`%roofline` = per-section roofline-bound time / measured "
            "time;\n`n/a` marks sections with no analytic cost model yet "
            "(they do move bytes —\nthe blank is honest, not zero "
            "traffic). Byte figures for the eval local-max\ngate, shortcut "
            "max_pool and the head kernel are rough gather/DMA-volume\n"
            "estimates, not exact counts. `GVop` counts VPU elementwise "
            "ops (selection\ndistances + argmin-extraction sweeps for the "
            "select kernels; threshold\nselection + per-kernel-point "
            "influence chains for the band convs) against\nan ESTIMATED "
            "~3.9 Top/s f32 VPU peak; each section's `%roofline` is the "
            "max of\nits MXU, HBM and VPU terms, and VPU ops are excluded "
            "from the MFU numerator\n(MFU counts model FLOPs only).\n\n"
            "```\n" + table + "\n```\n\n"
            "The pipeline is NOT MXU-bound: the useful conv FLOPs are "
            "small at these\npoint counts, and the time goes to "
            "selection/influence VPU work, sorts and\ngathers. The honest "
            "MFU number above reflects that; the per-section table\nshows "
            "which sections sit at their own roofline.\n")
    print("\nwrote MFU.md")


if __name__ == "__main__":
    main()
