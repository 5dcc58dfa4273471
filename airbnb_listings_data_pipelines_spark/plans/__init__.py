from . import adhoc, datamart, pipeline, staging, warehouse  # noqa: F401
