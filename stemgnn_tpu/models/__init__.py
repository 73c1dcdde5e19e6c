from stemgnn_tpu.models.stemgnn import (  # noqa: F401
    StemGNN,
    forward,
    init_params,
    param_count,
)
