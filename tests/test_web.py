"""Interactive surfaces: HTTP service (reference bin/web.py parity)
and one-shot query CLI (reference bin/query.py parity)."""

import json
import threading
import urllib.request

import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.index import build_index
from patapsco_ray.stages import write_doc_store
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("web")
    docs = pa.table({
        "doc_id": ["d1", "d2", "d3"],
        "text": ["cats chase mice", "dogs chase cats daily",
                 "birds sing songs"],
    })
    import pyarrow.parquet as pq

    pq.write_table(docs, d / "docs.parquet")
    build_index([str(d / "docs.parquet")], d / "idx",
                text_config=TextConfig(stopwords=False),
                id_column="doc_id", html_column=None)
    write_doc_store(ray.data.from_arrow(docs), d / "store", num_buckets=2)

    from patapsco_ray.web import serve

    srv = serve(str(d / "idx"), store_dir=str(d / "store"),
                host="127.0.0.1", port=0, k=10)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", str(d / "idx"), str(d / "store")
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_web_query_route(served):
    base, _, _ = served
    import urllib.parse
    code, hits = _get(base + "/query/" + urllib.parse.quote("cats chase"))
    assert code == 200
    assert [h["doc_id"] for h in hits][:2] == ["d1", "d2"] or \
        len(hits) >= 2
    assert hits[0]["rank"] == 0
    assert hits[0]["score"] >= hits[-1]["score"]


def test_web_doc_route(served):
    base, _, _ = served
    code, doc = _get(base + "/doc/d2")
    assert code == 200
    assert doc["doc_id"] == "d2"
    code, err = _get(base + "/doc/ghost")
    assert code == 404  # reference web.py:44 flask.abort(404)


def test_web_unknown_route(served):
    base, _, _ = served
    code, _ = _get(base + "/nope")
    assert code == 404


def test_query_cli(served, capsys):
    _, idx, _ = served
    from patapsco_ray.__main__ import main

    assert main(["query", "-i", idx, "-q", "cats chase", "-c", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    doc, score = out[0].split("\t")
    assert doc in {"d1", "d2"}
    float(score)

    assert main(["query", "-i", idx, "-q", "zzzznope"]) == 0
    assert capsys.readouterr().out.strip() == "No results"


def test_query_cli_qld_and_bool(served, capsys):
    _, idx, _ = served
    from patapsco_ray.__main__ import main

    assert main(["query", "-i", idx, "-q", "cats chase", "--qld"]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["query", "-i", idx, "-q", "cats AND chase",
                 "--bool"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # AND semantics: only docs containing both terms
    assert sorted(line.split("\t")[0] for line in out) == ["d1", "d2"]


def test_query_cli_rm3(served, capsys):
    _, idx, store = served
    from patapsco_ray.__main__ import main

    assert main(["query", "-i", idx, "-q", "cats", "--rm3",
                 "--store", store]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_build_and_compact(ray_session, tmp_path, capsys):
    """`python -m patapsco_ray build|compact` surface."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from patapsco_ray.__main__ import main

    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(pa.table({
        "url": [f"d{i}" for i in range(50)],
        "text": [f"hello world doc {i}" for i in range(50)],
    }), inp / "docs.parquet", row_group_size=10)
    rc = main(["build", "-i", str(inp), "-o", str(tmp_path / "idx"),
               "--rows-per-segment", "10", "--html-column", ""])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ndocs"] == 50 and out["segments"] == 5
    rc = main(["compact", "-i", str(tmp_path / "idx"),
               "-o", str(tmp_path / "cidx"), "--target-docs", "1000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ndocs"] == 50 and out["segments"] == 1
    from patapsco_ray.search import IndexSearcher

    hits = IndexSearcher(tmp_path / "cidx").search("hello", k=5)
    assert len(hits) == 5


def test_cli_norm_and_delete(ray_session, tmp_path, capsys):
    """`python -m patapsco_ray norm|delete` surface."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from patapsco_ray.__main__ import main

    f = tmp_path / "t.txt"
    f.write_text("Café  x\r\ny")
    assert main(["norm", "-l", "eng", str(f)]) == 0
    assert capsys.readouterr().out == "Café x\ny\n"

    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(pa.table({
        "url": [f"d{i}" for i in range(20)],
        "text": ["common text here"] * 20,
    }), inp / "docs.parquet")
    assert main(["build", "-i", str(inp), "-o", str(tmp_path / "idx"),
                 "--html-column", ""]) == 0
    capsys.readouterr()
    assert main(["delete", "-i", str(tmp_path / "idx"), "d3", "d7"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted_total"] == 2
    from patapsco_ray.search import IndexSearcher

    ids = {h["doc_id"]
           for h in IndexSearcher(tmp_path / "idx").search("common", k=20)}
    assert ids and not {"d3", "d7"} & ids
