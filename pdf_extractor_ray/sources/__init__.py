from .corpus import PageSynthesizer, pages_dataset, synthesize_pages  # noqa: F401
from .files import pages_from_files  # noqa: F401
from .warc import pages_from_warc, parse_warc_bytes, texts_from_wet, write_wet  # noqa: F401
from .text_table import documents_from_csv, documents_from_jsonl  # noqa: F401
