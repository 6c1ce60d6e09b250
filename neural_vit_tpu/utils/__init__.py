from neural_vit_tpu.utils.profiling import StepTimer, trace  # noqa: F401
