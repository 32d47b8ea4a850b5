from .corpus import PageSynthesizer, synthesize_pages, pages_dataset  # noqa: F401
