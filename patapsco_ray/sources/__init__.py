from .extract import extract_text, html_to_text
from .webpages import generate_webpages
from .readers import (
    read_jsonl_documents,
    read_jsonl_topics,
    read_sgml_documents,
    read_sgml_topics,
    read_tsv_documents,
    read_tsv_topics,
    topics_to_queries,
)
from .warc import (
    build_http_response,
    build_warc_record,
    read_warc_documents,
    write_warc_file,
)

__all__ = [
    "extract_text",
    "html_to_text",
    "generate_webpages",
    "read_jsonl_documents",
    "read_jsonl_topics",
    "read_sgml_documents",
    "read_sgml_topics",
    "read_tsv_documents",
    "read_tsv_topics",
    "topics_to_queries",
    "build_http_response",
    "build_warc_record",
    "read_warc_documents",
    "write_warc_file",
]
