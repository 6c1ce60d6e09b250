from neural_vit_tpu.models.vit import Temporal3DViT  # noqa: F401
