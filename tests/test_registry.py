"""Pipeline registry: built-in modes + user extension."""
from __future__ import annotations

from pdf_extractor_ray.pipelines.registry import get_pipeline, modes, register


def test_builtin_modes():
    assert {"extract", "construction", "standard"} <= set(modes())


def test_register_and_run_custom_mode(ray_session, sf_dir):
    from pdf_extractor_ray.sources.corpus import pages_dataset

    @register("char_count")
    def char_count(pages_ds, **kw):
        return (
            get_pipeline("extract")(pages_ds, **kw)
            .select_columns(["url", "n_chars"])
        )

    df = get_pipeline("char_count")(pages_dataset(sf_dir)).to_pandas()
    assert len(df) == 500 and set(df.columns) == {"url", "n_chars"}


def test_unknown_mode_lists_known():
    try:
        get_pipeline("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "extract" in str(e)
