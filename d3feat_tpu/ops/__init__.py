from d3feat_tpu.ops.subsample import (  # noqa: F401
    SHADOW_COORD,
    SubsampleResult,
    lengths_to_cloud_ids,
    lengths_to_mask,
    voxel_subsample,
)
from d3feat_tpu.ops.neighbors import (  # noqa: F401
    count_in_radius,
    radius_neighbors,
    radius_neighbors_grid,
)
from d3feat_tpu.ops.pyramid import PyramidSpec, build_pyramid, make_pyramid_spec  # noqa: F401
