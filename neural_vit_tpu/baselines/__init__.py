from neural_vit_tpu.baselines.common import (  # noqa: F401
    build_sequence_features,
    load_split_features,
    write_metrics,
)
