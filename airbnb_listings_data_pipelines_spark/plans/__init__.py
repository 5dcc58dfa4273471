from . import adhoc, datamart, pipeline, preprocess, staging, warehouse  # noqa: F401
