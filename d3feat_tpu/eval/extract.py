"""Per-fragment feature extraction over a test set.

Counterpart of the reference ``generate_features``
(reference: test.py:85-128), re-designed for the device: each fragment is
packed into the smallest static capacity bucket (bounded recompilation: one
compiled program per bucket), the on-device pyramid + KPFCNN forward runs
in a single jitted call, and the valid rows (descriptors, scores, keypoint
coordinates) come back to the host. The reference instead pairs the
fragment with itself through the training collate and slices the first
half (datasets/ThreeDMatch.py:200-203) — twice the compute for nothing.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import choose_bucket, pack_single
from d3feat_tpu.eval.registration import FragmentFeatures
from d3feat_tpu.train.step import make_extract_step

DEFAULT_BUCKETS = (4096, 8192, 16384, 32768)


def _bucket_caps(config: D3FeatConfig, cap0: int) -> PyramidCaps:
    """Scale the per-level capacities proportionally to the L0 bucket."""
    base = config.caps
    scale = cap0 / base.points[0]
    pts = [cap0]
    for p in base.points[1:]:
        pts.append(max(64, int(np.ceil(p * scale))))
    return PyramidCaps(points=tuple(pts), neighbors=base.neighbors,
                      corr=base.corr)


class FeatureExtractor:
    """Bucketed jitted extraction: fragment [N,3] -> (desc, scores)."""

    def __init__(self, config: D3FeatConfig, params, model_state,
                 buckets: Sequence[int] = DEFAULT_BUCKETS):
        self.config = config
        self.params = params
        self.model_state = model_state
        self.buckets = tuple(sorted(buckets))
        self._steps: Dict[int, object] = {}

    def _step_for(self, cap0: int):
        if cap0 not in self._steps:
            import jax
            from dataclasses import replace as dc_replace

            cfg = D3FeatConfig.from_dict(self.config.to_dict())
            cfg.caps = _bucket_caps(self.config, cap0)
            self._steps[cap0] = jax.jit(make_extract_step(cfg))
        return self._steps[cap0]

    def extract(self, points: np.ndarray):
        """(descriptors [N,D], scores [N]) for one fragment."""
        n = len(points)
        cap0 = choose_bucket(n, self.buckets)
        step = self._step_for(cap0)
        batch = pack_single(
            points, np.ones((n, 1), np.float32), point_capacity=cap0
        )
        feats, scores = step(
            self.params, self.model_state,
            {k: jnp.asarray(v) for k, v in batch.items()},
        )
        return np.asarray(feats[:n]), np.asarray(scores[:n, 0])


def generate_features(
    extractor: FeatureExtractor,
    testset,
    *,
    save_path: Optional[str] = None,
    desc_name: str = "D3Feat",
    verbose: bool = False,
) -> Dict[str, FragmentFeatures]:
    """Extract every fragment of ``testset`` grouped per scene; optionally
    persist in the reference's .npy layout (test.py:113-127)."""
    per_scene: Dict[str, FragmentFeatures] = {}
    counters: Dict[str, int] = {}
    for i in range(len(testset)):
        scene = testset.scene_of[i]
        pts = testset.get_fragment(i)
        desc, scores = extractor.extract(pts)
        fid = counters.get(scene, 0)
        counters[scene] = fid + 1
        per_scene.setdefault(scene, FragmentFeatures()).add(
            fid, pts, desc, scores
        )
        if verbose:
            print(f"[extract] {scene}/cloud_bin_{fid}: {len(pts)} pts")
    if save_path is not None:
        for scene, feats in per_scene.items():
            feats.save(save_path, scene, desc_name)
    return per_scene
