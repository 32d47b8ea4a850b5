from .extract import (  # noqa: F401
    HtmlExtractStage,
    PdfExtractStage,
    sniff_doc_kind,
)
from .parse import ItemsStage, EntitiesStage  # noqa: F401
