from .extract import extract_text, html_to_text
from .webpages import generate_webpages

__all__ = ["extract_text", "html_to_text", "generate_webpages"]
