"""Hash-partitioned Parquet document store.

Replaces the reference's sqlitedict doc database
(/root/reference/patapsco/database.py:26-74: doc_id -> JSON Doc with
the pre-tokenization normalized text) with bucketed Parquet: each doc
row is routed to ``bucket = hash64(doc_id) % num_buckets`` and buckets
are written as separate partition directories, doc_id-sorted inside so
point lookups touch one bucket's row groups via predicate pushdown.
The part-db merge step (database.py:104-115) disappears — buckets are
written once, in parallel, by Ray's parquet sink.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

from ..functions.hashing import stable_hash_strings

DEFAULT_BUCKETS = 64

# bump if the routing hash algorithm ever changes; stores written with a
# different version fail loudly instead of silently missing lookups
HASH_VERSION = "stable-splitmix-v1"

_META_FILE = "_store_meta.json"


def write_doc_store(
    ds: ray.data.Dataset,
    path: str | pathlib.Path,
    *,
    id_column: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
    text_column: str = "text",
) -> str:
    """Write a processed-docs Dataset as a bucketed store."""

    def add_bucket(tbl: pa.Table) -> pa.Table:
        ids = pc.cast(tbl.column(id_column), pa.string()).combine_chunks()
        bucket = (stable_hash_strings(ids)
                  % np.uint64(num_buckets)).astype(np.int32)
        return tbl.append_column("bucket", pa.array(bucket))

    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        str(path), partition_cols=["bucket"]
    )
    # the modulus and hash algorithm are part of the on-disk contract:
    # record them so readers never have to infer (empty high buckets
    # made max(bucket)+1 wrong) and a hash change can't silently
    # misroute lookups
    (path / _META_FILE).write_text(json.dumps({
        "num_buckets": num_buckets,
        "hash": HASH_VERSION,
        "id_column": id_column,
        "text_column": text_column,
    }))
    return str(path)


class DocStore:
    """Read side: point/batch lookups by doc_id.

    One instance per Ray actor (e.g. inside a reranker's
    ``map_batches`` class); the pyarrow dataset handle and partition
    listing are built once.
    """

    def __init__(self, path: str | pathlib.Path,
                 id_column: str = "doc_id",
                 num_buckets: int | None = None):
        self.path = pathlib.Path(path)
        self.id_column = id_column
        self.text_column = "text"
        meta_path = self.path / _META_FILE
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            if meta.get("hash") != HASH_VERSION:
                raise ValueError(
                    f"doc store at {path} was written with hash "
                    f"{meta.get('hash')!r}, this reader uses {HASH_VERSION!r}"
                    " — rebuild the store")
            self.num_buckets = int(meta["num_buckets"])
            self.id_column = meta.get("id_column", id_column)
            self.text_column = meta.get("text_column", "text")
        elif num_buckets is not None:
            self.num_buckets = num_buckets
        else:
            raise FileNotFoundError(
                f"no {_META_FILE} under {path} and num_buckets not given; "
                "inferring the modulus from populated partitions is unsafe "
                "(empty high buckets would misroute lookups)")
        if not any(self.path.glob("bucket=*")):
            raise FileNotFoundError(f"no bucket partitions under {path}")
        self._ds = pads.dataset(
            str(self.path), partitioning="hive",
            ignore_prefixes=[".", "_"])

    def lookup(self, doc_ids: list[str], columns: list[str] | None = None
               ) -> pa.Table:
        """Fetch rows for the given ids; reads only the buckets they
        hash to (order not guaranteed; missing ids absent)."""
        ids = [str(d) for d in doc_ids]
        arr = pa.array(ids, pa.string())
        wanted_buckets = np.unique(
            stable_hash_strings(arr) % np.uint64(self.num_buckets)
        ).astype(np.int64)
        filt = (
            pads.field("bucket").isin([int(b) for b in wanted_buckets])
            & pads.field(self.id_column).isin(ids)
        )
        tbl = self._ds.to_table(filter=filt, columns=columns)
        return tbl.drop_columns(
            [c for c in ("bucket",) if c in tbl.schema.names]
        )

    def get(self, doc_id: str) -> dict | None:
        t = self.lookup([doc_id])
        if t.num_rows == 0:
            return None
        return {k: v[0] for k, v in t.to_pydict().items()}
