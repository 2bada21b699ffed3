from . import dedup, multimodal, similarity, text  # noqa: F401
