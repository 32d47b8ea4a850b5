from .extraction import (  # noqa: F401
    extraction_pipeline,
    items_pipeline,
    entities_pipeline,
    run_extraction_job,
)
