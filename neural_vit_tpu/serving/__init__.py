from neural_vit_tpu.serving.export import (  # noqa: F401
    ExportedModel,
    export_checkpoint,
    load_exported,
    save_exported,
)
from neural_vit_tpu.serving.quantize import (  # noqa: F401
    make_quantized_forward,
    quantize_dense_tree,
)
