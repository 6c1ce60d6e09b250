from neural_vit_tpu.core.config import CONFIGS, Temporal3DViTConfig  # noqa: F401
