from .extract import (  # noqa: F401
    HtmlExtractStage,
    PageMetaStage,
    PageStructureStage,
    PdfExtractStage,
    sniff_doc_kind,
)
from .parse import ItemsStage, EntitiesStage  # noqa: F401
