from neural_vit_tpu.training.config import TrainConfig  # noqa: F401
from neural_vit_tpu.training.loop import evaluate, train  # noqa: F401
