from . import curation, dedup, multimodal, scd, similarity, skew, text  # noqa: F401
