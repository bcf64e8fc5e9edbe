"""TREC run file writer/reader and Parquet results artifacts.

Reference behaviors reproduced:
- line format ``{query_id} Q0 {doc_id} {rank} {score} {system}``
  (results.py:63-64); ranks are 0-based as assigned by retrieval
  (retrieve.py:146)
- the reader groups rows by query id into nested per-query results
  (results.py:91-99)
- parallel part files are concatenated in sorted part order
  (results.py:74-77, pipeline.py:77); we instead sort the final table
  by (query_id, rank), which is order-identical for rank-contiguous
  runs and robust to block reordering (SURVEY.md §2.5 hard part 6)
- JSONL results artifacts (JsonResultsWriter, results.py:111-142)
  become Parquet: flat tables for the data plane plus a nested
  list<struct> form matching the reference's Results record shape
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

RESULTS_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("doc_id", pa.string()),
        ("rank", pa.int32()),
        ("score", pa.float64()),
    ]
)


def results_to_trec_lines(
    results: pa.Table | ray.data.Dataset, system: str = "patapsco_ray"
) -> pa.Table | ray.data.Dataset:
    """Format a flat results table into TREC run lines (column
    ``line``), vectorized with pyarrow.compute."""

    def fmt(tbl: pa.Table) -> pa.Table:
        qid = pc.cast(tbl.column("query_id"), pa.string())
        doc = pc.cast(tbl.column("doc_id"), pa.string())
        rank = pc.cast(tbl.column("rank"), pa.string())
        # Python float formatting to match the reference's f-string
        # output exactly (results.py:63: "3.0" not "3")
        score = pa.array(
            [str(float(s)) for s in tbl.column("score").to_pylist()],
            pa.string(),
        )
        sep = pa.array([" "] * tbl.num_rows, pa.string())
        q0 = pa.array(["Q0"] * tbl.num_rows, pa.string())
        sysname = pa.array([system] * tbl.num_rows, pa.string())
        line = pc.binary_join_element_wise(qid, q0, doc, rank, score, sysname, sep)
        return pa.table({"line": line})

    if isinstance(results, ray.data.Dataset):
        return results.map_batches(fmt, batch_format="pyarrow")
    return fmt(results)


def write_trec_run(
    results: pa.Table | ray.data.Dataset,
    path: str | pathlib.Path,
    system: str = "patapsco_ray",
) -> pathlib.Path:
    """Write a single TREC run file sorted by (query_id, rank).

    Query counts are small relative to docs (the reference's stage-2
    progress interval is 10, schema.py:227), so the final sort +
    single-file write happen driver-side.
    """
    if isinstance(results, ray.data.Dataset):
        results = pa.concat_tables(
            ray.get(results.to_arrow_refs()), promote_options="default"
        )
    results = results.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    lines = results_to_trec_lines(results, system).column("line").to_pylist()
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("".join(line + "\n" for line in lines))
    return path


def read_trec_run(path: str | pathlib.Path) -> pa.Table:
    """Read a TREC run file back into a flat results table (reference
    TrecResultsReader, results.py:80-108; whitespace-delimited)."""
    qids, docs, ranks, scores = [], [], [], []
    for line in pathlib.Path(path).read_text().splitlines():
        if not line.strip():
            continue
        parts = line.split()
        qids.append(parts[0])
        docs.append(parts[2])
        ranks.append(int(parts[3]))
        scores.append(float(parts[4]))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "rank": pa.array(ranks, pa.int32()),
            "score": pa.array(scores, pa.float64()),
        },
        schema=RESULTS_SCHEMA,
    )


NESTED_RESULTS_TYPE = pa.list_(
    pa.struct(
        [("doc_id", pa.string()), ("rank", pa.int32()), ("score", pa.float64())]
    )
)


def write_results_parquet(
    results: pa.Table | ray.data.Dataset, path: str | pathlib.Path,
    nested: bool = False,
) -> None:
    """Results artifact (reference JsonResultsWriter -> Parquet).

    ``nested=True`` groups to one row per query with a
    list<struct{doc_id, rank, score}> column — the reference's Results
    record shape (results.py:25-31).
    """
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if isinstance(results, pa.Table):
        results = ray.data.from_arrow(results)
    if nested:
        def to_nested(grp: pa.Table) -> pa.Table:
            grp = grp.sort_by([("rank", "ascending")])
            entry = pa.StructArray.from_arrays(
                [
                    pc.cast(grp.column("doc_id"), pa.string()).combine_chunks(),
                    pc.cast(grp.column("rank"), pa.int32()).combine_chunks(),
                    pc.cast(grp.column("score"), pa.float64()).combine_chunks(),
                ],
                names=["doc_id", "rank", "score"],
            )
            nested_col = pa.ListArray.from_arrays(
                pa.array([0, len(entry)], pa.int32()), entry
            )
            return pa.table(
                {
                    "query_id": grp.column("query_id").slice(0, 1),
                    "results": nested_col,
                }
            )

        results = results.groupby("query_id").map_groups(
            to_nested, batch_format="pyarrow"
        )
    results.write_parquet(str(path))


def read_results_parquet(path: str | pathlib.Path) -> ray.data.Dataset:
    """Read a results artifact; explodes nested form back to flat."""
    ds = ray.data.read_parquet(str(path))
    if "results" not in ds.schema().names:
        return ds

    def explode(tbl: pa.Table) -> pa.Table:
        out_q, out_d, out_r, out_s = [], [], [], []
        for qid, entries in zip(
            tbl.column("query_id").to_pylist(), tbl.column("results").to_pylist()
        ):
            for e in entries:
                out_q.append(qid)
                out_d.append(e["doc_id"])
                out_r.append(e["rank"])
                out_s.append(e["score"])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_d, pa.string()),
                "rank": pa.array(out_r, pa.int32()),
                "score": pa.array(out_s, pa.float64()),
            },
            schema=RESULTS_SCHEMA,
        )

    return ds.map_batches(explode, batch_format="pyarrow")
