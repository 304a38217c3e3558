"""Aggregate a warm-step perfetto trace by HLO source location.

Joins the profiler's per-op durations with the compiled HLO's metadata
(source_file:source_line) so time buckets map to framework code sections.
Usage: python tools/profile_agg.py [--train]
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
from d3feat_tpu.train.step import init_train_state, make_extract_step

STEPS = 5

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40,) * 5, corr=128)
cfg.query_tile = 512

rng = np.random.default_rng(0)
f = scan_fragment(rng)
while not (12000 <= len(f) <= 16000):
    f = scan_fragment(rng)
b = pack_fragments([f], point_capacity=16384, num_clouds=2)
batch = {k: jnp.asarray(v) for k, v in b.items()}

TRAIN = "--train" in sys.argv

ts, specs = init_train_state(jax.random.key(0), cfg)
if TRAIN:
    from d3feat_tpu.data.synthetic import scan_pair
    from d3feat_tpu.data.pack import pack_pair
    from d3feat_tpu.train.step import make_train_step

    rng2 = np.random.default_rng(1)
    p0, p1, corr, dk = scan_pair(rng2)
    bp = pack_pair(p0, p1, np.ones((len(p0), 1), np.float32),
                   np.ones((len(p1), 1), np.float32), corr, dk,
                   point_capacity=2 * 16384, corr_capacity=128)
    cfg.caps = PyramidCaps(points=(32768, 16384, 4096, 1536, 512),
                           neighbors=(40,) * 5, corr=128)
    batch = {k: jnp.asarray(v) for k, v in bp.items()}
    tstep = jax.jit(make_train_step(cfg))
    epoch0 = jnp.int32(0)

    def extract(ts_, ms_, b_):  # same call surface for the loop below
        nonlocal_ts, m = tstep(run_state[0], b_, epoch0)
        run_state[0] = nonlocal_ts
        return m

    run_state = [ts]
    lowered = tstep.lower(ts, batch, epoch0).compile()
else:
    extract = jax.jit(make_extract_step(cfg, specs, num_clouds=2))
    lowered = extract.lower(ts.params, ts.model_state, batch).compile()
hlo = lowered.as_text()

# map every named HLO op -> source_file:line (+ op_name hint)
loc = {}
pat = re.compile(
    r"%([\w.\-]+) = [^\n]*?metadata=\{[^}]*?"
    r'(?:op_name="([^"]*)")?[^}]*?'
    r'source_file="([^"]+)"[^}]*?source_line=(\d+)')
for m in pat.finditer(hlo):
    name, opn, sf, sl = m.groups()
    loc[name] = (f"{os.path.basename(sf)}:{sl}", (opn or "")[:60])

out = extract(ts.params, ts.model_state, batch)
jax.block_until_ready(out)

TRACE = "/tmp/jtrace_agg"
os.system(f"rm -rf {TRACE}")
jax.profiler.start_trace(TRACE)
for _ in range(STEPS):
    out = extract(ts.params, ts.model_state, batch)
jax.block_until_ready(out)
jax.profiler.stop_trace()

files = glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True)
agg = defaultdict(float)
ex = {}
total = 0.0
for fn in files:
    for e in json.load(gzip.open(fn))["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        n = e.get("name", "?")
        if n.startswith(("jit_", "$", "Pjit", "ParseArg", "Transfer")):
            continue
        if n in loc:
            key = loc[n][0]
            ex.setdefault(key, (n, loc[n][1]))
        elif n.rstrip("0123456789.") in ("band_conv", "band_select",
                                         "band_conv_bwd"):
            key = "pallas:" + n.rstrip("0123456789.")
            ex.setdefault(key, (n, ""))
        else:
            key = "other:" + n.rstrip("0123456789.")
            ex.setdefault(key, (n, ""))
        agg[key] += e["dur"]
        total += e["dur"]

rows = sorted(agg.items(), key=lambda kv: -kv[1])
print(f"{'us/step':>9} {'pct':>5}  source (example op | op_name)")
for key, us in rows:
    if us / STEPS < 20:
        continue
    n, opn = ex[key]
    print(f"{us / STEPS:9.0f} {100 * us / total:5.1f}  {key}   [{n} | {opn}]")
print(f"\ntotal device us/step: {total / STEPS:.0f}")
