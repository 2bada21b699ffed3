from . import components, dedup, multimodal, similarity, text  # noqa: F401
