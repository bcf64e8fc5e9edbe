"""TREC qrels reading (reference score.py:27-42, util/formats.py:96-110).

Format: ``query_id iteration doc_id relevance`` with space/tab
autodetection; multiple globbed files merge by dict union.
"""

from __future__ import annotations

import glob as globlib
import pathlib


def read_qrels(path_or_glob: str | pathlib.Path) -> dict[str, dict[str, int]]:
    paths = sorted(globlib.glob(str(path_or_glob)))
    if not paths:
        p = pathlib.Path(path_or_glob)
        if p.exists():
            paths = [str(p)]
        else:
            raise FileNotFoundError(f"no qrels match {path_or_glob}")
    qrels: dict[str, dict[str, int]] = {}
    for path in paths:
        text = pathlib.Path(path).read_text()
        delimiter = "\t" if "\t" in text.splitlines()[0] else " "
        for line in text.splitlines():
            if not line.strip():
                continue
            parts = line.split(delimiter)
            if len(parts) < 4:
                parts = line.split()
            qid, _iter, doc_id, rel = parts[0], parts[1], parts[2], parts[3]
            qrels.setdefault(qid, {})[doc_id] = int(rel)
    return qrels
