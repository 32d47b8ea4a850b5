from .extraction import (  # noqa: F401
    entities_pipeline,
    extraction_pipeline,
    items_pipeline,
    run_extraction_job,
)
from .registry import get_pipeline, modes, register  # noqa: F401
