"""Segment compaction: rank/score identity and stats preservation."""

import pytest

from patapsco_ray.index import build_index, compact_index, read_manifest
from patapsco_ray.search import IndexSearcher
from patapsco_ray.sources import generate_webpages
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("compact")
    paths = generate_webpages(d / "corpus", 4000, num_files=8)
    idx = d / "idx"
    m = build_index(paths, idx, text_config=TextConfig(stem="porter"),
                    rows_per_segment=500)
    assert len(m["segments"]) == 8
    out = d / "compacted"
    cm = compact_index(idx, out, target_docs_per_segment=1500)
    return str(idx), str(out), m, cm


def test_compaction_reduces_segments(built):
    _, _, m, cm = built
    assert len(cm["segments"]) < len(m["segments"])
    assert cm["ndocs"] == m["ndocs"]
    assert cm["total_tf"] == m["total_tf"]
    assert sum(s["npostings"] for s in cm["segments"]) == \
        sum(s["npostings"] for s in m["segments"])


def test_compaction_rank_score_identity(built):
    idx, out, _, _ = built
    a, b = IndexSearcher(idx), IndexSearcher(out)
    for q in ["world state people", "the term00042 work", "caf\xc3\xa9",
              "great little new old year"]:
        ha = [(h["doc_id"], round(h["score"], 10)) for h in a.search(q, k=30)]
        hb = [(h["doc_id"], round(h["score"], 10)) for h in b.search(q, k=30)]
        assert ha == hb, q


def test_compaction_lineage(built):
    _, out, _, cm = built
    man = read_manifest(out)
    assert man["compacted_from"]
    import json
    import pathlib

    meta = json.loads(
        (pathlib.Path(out) / f"seg={cm['segments'][0]['seg_id']}" /
         "meta.json").read_text())
    assert meta["compacted_from"]
