from d3feat_tpu.losses.distances import cdist  # noqa: F401
from d3feat_tpu.losses.descriptor import (  # noqa: F401
    DescLossResult,
    circle_loss,
    contrastive_loss,
)
from d3feat_tpu.losses.detector import det_loss  # noqa: F401
from d3feat_tpu.losses.regularizers import p2p_fitting_regularizer  # noqa: F401
