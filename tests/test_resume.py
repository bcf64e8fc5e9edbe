"""Resumable builds: per-segment lineage, partial-state recovery.

Mirrors the reference's .complete-marker resume semantics
(job.py:672-685, 903-927): completed segments with matching lineage
are skipped; stale partial output is cleaned and rebuilt.
"""

import json
import pathlib
import shutil

import pytest

from patapsco_ray.index import build_index, read_manifest
from patapsco_ray.search import IndexSearcher
from patapsco_ray.sources import generate_webpages
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_corpus")
    return generate_webpages(d, 2000, num_files=8)


def _build(corpus, idx):
    return build_index(corpus, idx, text_config=TextConfig(stem="porter"),
                       rows_per_segment=500)


def test_resume_skips_complete_segments(corpus, tmp_path):
    idx = tmp_path / "idx"
    m1 = _build(corpus, idx)
    baseline = IndexSearcher(idx).search("world state people", k=10)

    # simulate a crashed run: two segments lost, one left as stale tmp
    segs = sorted(p for p in idx.glob("seg=*") if p.is_dir())
    assert len(segs) >= 4
    shutil.rmtree(segs[1])
    stale = idx / (segs[2].name + ".tmp")
    stale.mkdir()
    (stale / "junk").write_text("partial write")
    shutil.rmtree(segs[2])
    (idx / "manifest.json").unlink()

    m2 = _build(corpus, idx)
    assert m2["ndocs"] == m1["ndocs"]
    assert [s["seg_id"] for s in m2["segments"]] == \
        [s["seg_id"] for s in m1["segments"]]
    # identical rankings after recovery
    after = IndexSearcher(idx).search("world state people", k=10)
    assert [(h["doc_id"], h["score"]) for h in baseline] == \
        [(h["doc_id"], h["score"]) for h in after]
    assert not stale.exists()


def test_lineage_mismatch_forces_rebuild(corpus, tmp_path):
    idx = tmp_path / "idx2"
    _build(corpus, idx)
    seg = sorted(p for p in idx.glob("seg=*") if p.is_dir())[0]
    meta = json.loads((seg / "meta.json").read_text())
    mtime_terms = (seg / "terms.parquet").stat().st_mtime_ns
    # tamper with recorded lineage -> segment must be rebuilt
    meta["row_groups"] = [[999]]
    (seg / "meta.json").write_text(json.dumps(meta))
    _build(corpus, idx)
    meta2 = json.loads((seg / "meta.json").read_text())
    assert meta2["row_groups"] != [[999]]
    assert (seg / "terms.parquet").stat().st_mtime_ns != mtime_terms


def test_resume_reuses_untouched_segments(corpus, tmp_path):
    idx = tmp_path / "idx3"
    _build(corpus, idx)
    seg = sorted(p for p in idx.glob("seg=*") if p.is_dir())[0]
    mtime = (seg / "terms.parquet").stat().st_mtime_ns
    _build(corpus, idx)  # full re-run
    assert (seg / "terms.parquet").stat().st_mtime_ns == mtime  # not rewritten


def test_manifest_metrics(corpus, tmp_path):
    idx = tmp_path / "idx4"
    m = _build(corpus, idx)
    # lineage + metrics recorded per segment (north rule)
    for s in m["segments"]:
        meta = json.loads(
            (idx / f"seg={s['seg_id']}" / "meta.json").read_text())
        assert meta["status"] == "complete"
        assert meta["input_files"] and meta["row_groups"]
        assert meta["ndocs"] > 0 and meta["total_tf"] > 0
        assert meta["nterms"] > 0 and meta["npostings"] > 0
    assert read_manifest(idx)["avgdl"] == pytest.approx(
        m["total_tf"] / m["ndocs"])


def test_incremental_append(corpus, tmp_path, tmp_path_factory):
    """New input files appended after a build: existing segments are
    reused via lineage, only the new data is indexed."""
    idx = tmp_path / "idx5"
    m1 = _build(corpus, idx)
    n_before = len(m1["segments"])
    seg0 = sorted(p for p in idx.glob("seg=*") if p.is_dir())[0]
    mtime = (seg0 / "terms.parquet").stat().st_mtime_ns

    # append two more files that sort AFTER the existing ones
    extra_dir = pathlib.Path(corpus[0]).parent
    extra = generate_webpages(tmp_path / "extra", 500, num_files=2, seed=7)
    all_paths = list(corpus) + [str(p) for p in extra]
    m2 = build_index(all_paths, idx, text_config=TextConfig(stem="porter"),
                     rows_per_segment=500)
    assert m2["ndocs"] == m1["ndocs"] + 500
    assert len(m2["segments"]) > n_before
    # original segment untouched (resumed, not rebuilt)
    assert (seg0 / "terms.parquet").stat().st_mtime_ns == mtime
    # appended docs searchable
    from patapsco_ray.search import IndexSearcher
    hits = IndexSearcher(idx).search("world state", k=5)
    assert hits
