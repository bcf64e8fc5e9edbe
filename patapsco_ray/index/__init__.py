from .build import build_index, finalize_index, plan_segments, total_index_stats
from .build_shuffle import build_index_shuffle
from .compact import compact_index
from .deletes import clear_deletes, delete_documents, read_deleted_ids
from .codec import BLOCK_SIZE, decode_postings, encode_postings, varint_decode, varint_encode
from .norms import byte4_to_int, encode_lengths, int_to_byte4, DECODE_TABLE
from .segment import read_docs, read_manifest, read_terms, write_manifest

__all__ = [
    "build_index", "build_index_shuffle", "compact_index", "finalize_index",
    "plan_segments", "total_index_stats",
    "BLOCK_SIZE", "decode_postings", "encode_postings", "varint_decode",
    "varint_encode", "byte4_to_int", "encode_lengths", "int_to_byte4",
    "DECODE_TABLE", "read_docs", "read_manifest", "read_terms",
    "write_manifest",
    "clear_deletes", "delete_documents", "read_deleted_ids",
]
