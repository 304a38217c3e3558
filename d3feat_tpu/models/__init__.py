from d3feat_tpu.models.kernel_points import load_kernels  # noqa: F401
from d3feat_tpu.models.kpconv import KPConvParams, init_kpconv, kpconv  # noqa: F401
from d3feat_tpu.models.blocks import (  # noqa: F401
    BlockSpec,
    apply_block,
    classify_block,
    closest_pool,
    global_average,
    init_block,
    max_pool,
)
from d3feat_tpu.models.kpfcnn import (  # noqa: F401
    KPFCNNOutput,
    KPFCNNSpecs,
    apply_kpfcnn,
    detection_scores,
    init_kpfcnn,
    make_kpfcnn_specs,
)
from d3feat_tpu.models.kpcnn import (  # noqa: F401
    KPCNNSpecs,
    apply_kpcnn,
    init_kpcnn,
    kpcnn_accuracy,
    kpcnn_loss,
    make_kpcnn_specs,
)
