from .html_codec import HtmlCodec, HtmlExtraction  # noqa: F401
from .pdf_codec import PdfCodec, PdfExtraction  # noqa: F401
