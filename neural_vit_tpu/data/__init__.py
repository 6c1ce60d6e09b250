from neural_vit_tpu.data.sequences import build_sequence_index  # noqa: F401
from neural_vit_tpu.data.splits import (  # noqa: F401
    create_kfold_splits,
    create_session_splits,
    create_session_splits_df,
)
