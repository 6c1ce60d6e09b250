from neural_vit_tpu.serving.export import (  # noqa: F401
    ExportedModel,
    export_checkpoint,
    load_exported,
    save_exported,
)
