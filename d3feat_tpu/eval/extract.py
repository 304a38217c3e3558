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
    """Bucketed jitted extraction: fragment [N,3] -> (desc, scores).

    ``batch_fragments`` > 1 packs that many fragments into one stacked
    program call (fragments ride the cloud axis) — same per-fragment
    results (per-cloud score normalization == the reference's global max
    for one fragment), much better device utilization.
    """

    def __init__(self, config: D3FeatConfig, params, model_state,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 batch_fragments: int = 1,
                 on_overflow: str = "retry"):
        self.config = config
        self.params = params
        self.model_state = model_state
        self.buckets = tuple(sorted(buckets))
        self.batch_fragments = max(1, int(batch_fragments))
        # Capacity overflow silently truncates neighbor lists and degrades
        # descriptors/scores; it must never pass unnoticed on the serving
        # path. "retry": re-run in the next larger bucket (raise when the
        # largest bucket still overflows); "warn": emit a warning and keep
        # the degraded result; "raise": fail immediately.
        if on_overflow not in ("retry", "warn", "raise"):
            raise ValueError(f"on_overflow: {on_overflow!r}")
        self.on_overflow = on_overflow
        self._steps: Dict[tuple, object] = {}

    def _step_for(self, cap0: int, num_clouds: int):
        key = (cap0, num_clouds)
        if key not in self._steps:
            import jax

            cfg = D3FeatConfig.from_dict(self.config.to_dict())
            cfg.caps = _bucket_caps(self.config, cap0)
            self._steps[key] = jax.jit(
                make_extract_step(cfg, num_clouds=num_clouds)
            )
        return self._steps[key]

    def _handle_overflow(self, overflow, cap0: int, context: str) -> bool:
        """Returns True when the caller should retry in a larger bucket."""
        if not bool(overflow):
            return False
        larger = [c for c in self.buckets if c > cap0]
        if self.on_overflow == "retry" and larger:
            return True
        msg = (
            f"pyramid capacity overflow extracting {context} at bucket "
            f"{cap0}: neighbor lists were truncated and descriptors/scores "
            f"are degraded. Raise the capacity buckets or recalibrate "
            f"neighbor caps (d3feat_tpu.data.calibrate)."
        )
        if self.on_overflow == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=3)
            return False
        raise RuntimeError(msg)

    def extract(self, points: np.ndarray):
        """(descriptors [N,D], scores [N]) for one fragment."""
        n = len(points)
        cap0 = choose_bucket(n, self.buckets)
        while True:
            step = self._step_for(cap0, 2)
            batch = pack_single(
                points, np.ones((n, 1), np.float32), point_capacity=cap0
            )
            feats, scores, overflow = step(
                self.params, self.model_state,
                {k: jnp.asarray(v) for k, v in batch.items()},
            )
            if self._handle_overflow(overflow, cap0, f"fragment of {n} pts"):
                cap0 = min(c for c in self.buckets if c > cap0)
                continue
            return np.asarray(feats[:n]), np.asarray(scores[:n, 0])

    def extract_many(self, clouds):
        """[(desc, scores)] for a list of fragments, ``batch_fragments``
        per jitted call."""
        from d3feat_tpu.data.pack import pack_fragments

        b = self.batch_fragments
        if b == 1:
            return [self.extract(c) for c in clouds]
        results = []
        for i in range(0, len(clouds), b):
            group = clouds[i : i + b]
            per_frag = choose_bucket(max(len(c) for c in group), self.buckets)
            while True:
                cap0 = per_frag * b
                step = self._step_for(cap0, b)
                batch = pack_fragments(group, point_capacity=cap0,
                                       num_clouds=b)
                feats, scores, overflow = step(
                    self.params, self.model_state,
                    {k: jnp.asarray(v) for k, v in batch.items()},
                )
                if self._handle_overflow(
                    overflow, per_frag, f"group of {len(group)} fragments"
                ):
                    per_frag = min(c for c in self.buckets if c > per_frag)
                    continue
                break
            feats = np.asarray(feats)
            scores = np.asarray(scores)
            row = 0
            for c in group:
                n = len(c)
                results.append((feats[row : row + n], scores[row : row + n, 0]))
                row += n
        return results


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
