"""d3feat_tpu — a TPU-native point-cloud descriptor/detector framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
``XuyangBai/D3Feat.pytorch`` (CVPR'20 D3Feat: joint dense descriptor +
detection-score prediction over KPConv point-cloud networks, trained on
3DMatch fragment pairs and evaluated via feature-match recall).

Unlike the reference — where the multi-scale pyramid (grid subsampling +
radius neighbor search) runs in C++ on the CPU inside DataLoader workers —
this framework builds the entire pyramid **on device** with fixed-capacity,
statically-shaped XLA ops, so a whole fragment pair is processed end-to-end
inside a single jitted program, data-parallel over a ``jax.sharding.Mesh``.

Layout:
  ops/       on-device geometry: voxel subsampling, radius neighbors, pyramid
  models/    KPConv, network blocks, KPFCNN / KPCNN, kernel dispositions
  losses/    circle / contrastive / detector losses, distance kernels
  data/      3DMatch datasets, PLY I/O, augmentation, fixed-capacity packing
  train/     config-driven trainer, optimizer schedules, orbax checkpoints
  eval/      feature extraction + geometric-registration recall
  parallel/  mesh construction and shard_map'd data-parallel steps
  compat/    PyTorch checkpoint (.pth) → parameter-tree conversion
  native/    C++ host-side geometry ops (ctypes) for CPU parity / offline prep
"""

__version__ = "0.1.0"

from d3feat_tpu.config import D3FeatConfig  # noqa: F401
