from neural_vit_tpu.ops.spectrogram import (  # noqa: F401
    SpectrogramConfig,
    log_spectrogram,
    preprocess_traces,
    spectrogram_shape,
)
from neural_vit_tpu.ops.losses import weighted_smoothed_cross_entropy  # noqa: F401
