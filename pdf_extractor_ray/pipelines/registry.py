"""Pipeline registry — the engine's user-extension surface.

The reference's extension point is an ABC + factory
(`ExtractionStrategy` / `ExtractionServiceFactory`, reference:
extractor/services/extraction_service.py:20-40, 569-651): subclass,
wire into a service, select by mode flag. The engine's equivalent is a
registry of pipeline builder functions — a mode is a function
``pages_ds -> Dataset``; registering one makes it addressable from the
CLI and programmatic callers:

    from pdf_extractor_ray.pipelines.registry import register

    @register("my_mode")
    def my_pipeline(pages_ds, **kw):
        return extraction_pipeline(pages_ds, **kw).map_batches(my_stage, ...)

No inheritance, no service objects: a pipeline IS its Dataset plan.
"""
from __future__ import annotations

from typing import Callable, Dict

from .extraction import entities_pipeline, extraction_pipeline, items_pipeline

_REGISTRY: Dict[str, Callable] = {}


def register(mode: str) -> Callable[[Callable], Callable]:
    def deco(fn: Callable) -> Callable:
        _REGISTRY[mode] = fn
        return fn

    return deco


def get_pipeline(mode: str) -> Callable:
    try:
        return _REGISTRY[mode]
    except KeyError:
        raise KeyError(
            f"unknown pipeline mode {mode!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def modes() -> list:
    return sorted(_REGISTRY)


register("extract")(extraction_pipeline)
register("construction")(items_pipeline)
register("standard")(entities_pipeline)
