from neural_vit_tpu.utils.compile_cache import (  # noqa: F401
    enable_compilation_cache,
)
from neural_vit_tpu.utils.profiling import StepTimer, trace  # noqa: F401
