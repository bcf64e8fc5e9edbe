"""Tests for the training-data operator suite (functions/) against
DuckDB oracles on the driver's synthetic tables."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from patapsco_ray.functions import (
    cosine_neardup_pairs,
    cosine_topk,
    exact_duplicates,
    fingerprints,
    language_id,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_signals,
    simhash_pairs,
    token_counts,
)
from patapsco_ray.functions.multimodal import (
    decode_images,
    extract_audio_features,
    sample_video_frames,
)
from patapsco_ray.text.stopwords import load_stopwords

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EMB = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet(DOCS)


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet(EMB)


def test_token_counts_vs_sql(docs_ds):
    got = token_counts(docs_ds).to_pandas().sort_values("doc_id")
    want = duckdb.sql(
        f"""SELECT doc_id,
        len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
        FROM '{DOCS}' ORDER BY doc_id"""
    ).df()
    assert (got["n_tokens"].values == want["n_tokens"].values).all()
    assert (got["n_tokens_bpe"].values == want["n_bpe"].values).all()


def test_quality_signals_vs_sql(docs_ds):
    got = quality_signals(docs_ds).to_pandas().sort_values("doc_id")
    sw = ",".join(f"'{w}'" for w in sorted(load_stopwords("lucene", "eng")))
    want = duckdb.sql(
        f"""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(lower(text),' '),
            x -> x <> '')) AS term FROM '{DOCS}')
        SELECT d.doc_id, length(d.text) AS n_chars, count(t.term) AS n_tokens,
          count(DISTINCT t.term) AS n_unique_tokens,
          count(CASE WHEN t.term IN ({sw}) THEN 1 END) AS n_stopwords
        FROM '{DOCS}' d LEFT JOIN toks t USING (doc_id)
        GROUP BY d.doc_id, d.text ORDER BY doc_id"""
    ).df()
    for col in ("n_chars", "n_tokens", "n_unique_tokens", "n_stopwords"):
        assert (got[col].values == want[col].values).all(), col
    # ratio sanity
    assert (got["stopword_ratio"] <= 1.0).all()
    assert (got["unique_ratio"] <= 1.0).all()


def test_language_id(docs_ds):
    got = language_id(docs_ds).to_pandas()
    assert len(got) == 500
    # the synthetic corpus is english-like function words
    assert (got["pred_lang"] == "eng").mean() > 0.5
    assert set(got.columns) == {"doc_id", "pred_lang", "n_hits"}


def test_fingerprints_identical_docs_collide(ray_session):
    tbl = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f", "a b c d e f", "totally different words here",
                 ""],
    })
    got = fingerprints(ray.data.from_arrow(tbl)).to_pandas().set_index("doc_id")
    assert got.loc[1, "fingerprint"] == got.loc[2, "fingerprint"]
    assert got.loc[1, "fingerprint"] != got.loc[3, "fingerprint"]
    assert got.loc[4, "fingerprint"] == 0 and got.loc[4, "n_windows"] == 0


def test_winnow_fingerprints(ray_session):
    from patapsco_ray.functions import winnow_fingerprints

    tbl = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e f g h",          # 8 tokens -> 6 3-shingles
            "a b c d e f g h",          # identical -> same selection
            "x y",                      # short: one whole-doc shingle
            "",                         # empty: nothing
            "p q r p q r p q r p q r",  # repeats -> few distinct
        ],
    })
    ds = ray.data.from_arrow(tbl)
    got = winnow_fingerprints(ds, k=3, w=1).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_shingles"] == 6
    # w=1 selects every shingle; all 6 distinct here
    assert got.loc[1, "n_selected"] == 6
    assert got.loc[3, "n_shingles"] == 1 and got.loc[3, "n_selected"] == 1
    assert got.loc[4, "n_shingles"] == 0 and got.loc[4, "n_selected"] == 0
    assert got.loc[4, "min_fingerprint"] == 0
    # 12 tokens -> 10 positions but only 3 distinct shingles
    assert got.loc[5, "n_shingles"] == 10
    assert got.loc[5, "n_selected"] == 3
    # identical docs share the identical fingerprint selection
    assert got.loc[1, "min_fingerprint"] == got.loc[2, "min_fingerprint"]
    # w>1 selects a subset of the w=1 selection
    w4 = winnow_fingerprints(ds, k=3, w=4).to_pandas().set_index("doc_id")
    assert (w4["n_selected"] <= got["n_selected"]).all()
    assert (w4.loc[[1, 2, 3, 5], "n_selected"] >= 1).all()
    # winnowing guarantee: docs sharing a run >= w + k - 1 tokens share
    # at least one selected fingerprint -> identical docs 1/2 collide
    assert w4.loc[1, "min_fingerprint"] == w4.loc[2, "min_fingerprint"]


def test_exact_duplicates(ray_session):
    tbl = pa.table({
        "doc_id": [5, 1, 2, 9, 3],
        "text": ["x", "x", "y", "x", "y"],
    })
    got = exact_duplicates(ray.data.from_arrow(tbl)).to_pandas()
    got = got.sort_values("keep_id").reset_index(drop=True)
    assert got["keep_id"].tolist() == [1, 2]
    assert got["n_copies"].tolist() == [3, 2]


def test_ngram_jaccard_vs_sql(docs_ds):
    got = ngram_jaccard_pairs(docs_ds, threshold=0.2).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = duckdb.sql(
        f"""WITH toks AS (
          SELECT doc_id, list_filter(string_split(lower(text),' '),
            x -> x <> '') AS t FROM '{DOCS}'),
        shl AS (
          SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
            ELSE list_transform(range(1, len(t)-1),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shs
          FROM toks WHERE len(t) > 0),
        sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, n_common, na.n AS n_a, nb.n AS n_b,
          CAST(FLOOR(n_common*1.0/(na.n+nb.n-n_common)*1000000 + 0.5)
               AS BIGINT) AS jaccard_1e6
        FROM pairs JOIN sizes na ON pairs.id_a = na.doc_id
                   JOIN sizes nb ON pairs.id_b = nb.doc_id
        WHERE n_common*1.0/(na.n+nb.n-n_common) >= 0.2
        ORDER BY id_a, id_b"""
    ).df()
    assert len(got) == len(want) > 0
    cols = ["id_a", "id_b", "n_common", "n_a", "n_b", "jaccard_1e6"]
    assert (got[cols].values == want[cols].values).all()


def test_ngram_jaccard_head_shingle_cap(ray_session):
    """A shingle whose df exceeds max_shingle_df is dropped from pair
    generation (logged in the worker) but still counts toward set
    sizes, so reported jaccard becomes a LOWER bound for docs sharing
    it."""
    # every doc shares the head shingle "a b c"; pairs (1,2) also share
    # "x y z" etc. so they survive on those shingles alone
    tbl = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c x y z", "a b c x y z",
                 "a b c q r s", "a b c t u v"],
    })
    ds = ray.data.from_arrow(tbl)
    got = ngram_jaccard_pairs(
        ds, shingle_size=3, threshold=0.1, max_shingle_df=3
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # df("a b c")=4 > 3 -> dropped; only shingles unique to (1,2) pair
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 2)}
    # n_common counts only surviving shingles (3 of the 4 shared),
    # sizes still count all 4 distinct shingles per doc
    assert got.loc[0, "n_common"] == 3
    assert got.loc[0, "n_a"] == 4 and got.loc[0, "n_b"] == 4
    # uncapped control: the head shingle counts again
    full = ngram_jaccard_pairs(
        ds, shingle_size=3, threshold=0.1).to_pandas()
    pair12 = full[(full.id_a == 1) & (full.id_b == 2)]
    assert pair12["n_common"].tolist() == [4]
    assert pair12["jaccard_1e6"].tolist() == [1_000_000]


def test_ngram_jaccard_chunked_emission(ray_session, monkeypatch):
    """Multi-chunk triangle emission must equal single-chunk output."""
    from patapsco_ray.functions import dedup as dmod

    tbl = pa.table({
        "doc_id": list(range(8)),
        "text": ["common shingle here"] * 8,  # one group of df=8
    })
    ds = ray.data.from_arrow(tbl)
    want = ngram_jaccard_pairs(
        ds, shingle_size=3, threshold=0.1).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    monkeypatch.setattr(dmod, "_CHUNK_PAIRS", 3)  # 28 pairs -> many chunks
    got = ngram_jaccard_pairs(
        ds, shingle_size=3, threshold=0.1).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    assert len(want) == 28
    assert (got.values == want.values).all()


def test_minhash_finds_true_neardups(docs_ds):
    """Every very-high-Jaccard pair must be recalled by MinHash+LSH."""
    exact = ngram_jaccard_pairs(docs_ds, threshold=0.8).to_pandas()
    truth = {(a, b) for a, b in zip(exact["id_a"], exact["id_b"])}
    assert truth, "synthetic corpus should contain near-dups"
    got = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    found = set(zip(got["id_a"], got["id_b"]))
    assert truth <= found


def test_minhash_semi_join_path_matches_broadcast(docs_ds):
    """broadcast_max_ids=0 forces the hash-partitioned left_semi join
    (the no-driver-ceiling path for dup-heavy corpora); its output
    must be identical to the broadcast fast path."""
    want = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas(
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = minhash_lsh_pairs(
        docs_ds, threshold=0.5, broadcast_max_ids=0,
        semi_join_partitions=4).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    assert len(want) > 0
    assert (got.values == want.values).all()


def test_minhash_partitioned_verify_matches_small_path(docs_ds):
    """sig_broadcast_max_bytes=0 forces the coarse-partitioned
    attach/compare verify (the above-256MB scale path); it must be
    identical to the broadcast small-side verify."""
    want = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas(
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = minhash_lsh_pairs(
        docs_ds, threshold=0.5, sig_broadcast_max_bytes=0,
        target_group_rows=16).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    assert len(want) > 0
    assert (got.values == want.values).all()


def test_simhash_identical_docs(ray_session):
    tbl = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "unrelated text entirely different"],
    })
    got = simhash_pairs(ray.data.from_arrow(tbl), max_hamming=0).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 2)}
    assert got["hamming"].tolist() == [0]


def test_cosine_topk_vs_sql(emb_ds):
    Q = np.asarray(
        pq.read_table(EMB).column("embedding").combine_chunks().flatten()
        .to_numpy(zero_copy_only=False)).reshape(500, -1)[:3]
    cand = emb_ds.filter(expr="vec_id >= 3")
    got = cosine_topk(cand, Q, query_ids=["q0", "q1", "q2"], k=5).to_pandas()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = duckdb.sql(
        f"""WITH q AS (SELECT 'q' || CAST(vec_id AS VARCHAR) AS query_id,
              embedding::DOUBLE[] AS qe FROM '{EMB}' WHERE vec_id < 3),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM '{EMB}'
              WHERE vec_id >= 3),
        s AS (SELECT query_id, vec_id,
              CAST(FLOOR(list_cosine_similarity(qe, e)*1000000 + 0.5)
                   AS BIGINT) AS score_1e6 FROM q CROSS JOIN c)
        SELECT query_id, vec_id, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY score_1e6 DESC, vec_id) - 1
            AS BIGINT) AS rank, score_1e6
        FROM s QUALIFY rank < 5 ORDER BY query_id, rank"""
    ).df()
    assert (got["vec_id"].values == want["vec_id"].values).all()
    assert (got["score_1e6"].values == want["score_1e6"].values).all()


def test_cosine_neardup_vs_sql(emb_ds):
    got = cosine_neardup_pairs(emb_ds, threshold=0.4).to_pandas()
    want = duckdb.sql(
        f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM '{EMB}' a JOIN '{EMB}' b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[],
          b.embedding::DOUBLE[]) >= 0.4"""
    ).df()
    assert len(got) == len(want) > 0
    assert set(zip(got["id_a"], got["id_b"])) == \
        set(zip(want["id_a"], want["id_b"]))


def test_cosine_neardup_block_order_invariant(emb_ds):
    """Regression: with blocks whose id ranges are NOT globally sorted
    (random_shuffle + repartition), the exact path must still find
    every pair — an `ida < idb` cross-block filter silently dropped
    pairs from out-of-order blocks."""
    shuffled = emb_ds.random_shuffle(seed=7).repartition(7)
    got = cosine_neardup_pairs(shuffled, threshold=0.4).to_pandas()
    want = cosine_neardup_pairs(emb_ds, threshold=0.4).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == \
        set(zip(want["id_a"], want["id_b"])) and len(got) == len(want)


def test_lsh_topk_subset_of_exact_space(emb_ds):
    Q = np.asarray(
        pq.read_table(EMB).column("embedding").combine_chunks().flatten()
        .to_numpy(zero_copy_only=False)).reshape(500, -1)[:2]
    got = lsh_cosine_topk(emb_ds, Q, query_ids=["a", "b"], k=5,
                          planes=6).to_pandas()
    # approximate: valid schema, <= k rows per query, scores descending
    for _, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert len(grp) <= 5
        assert (np.diff(grp["score_1e6"].values) <= 0).all()


def test_multimodal_stubs(ray_session):
    payloads = [bytes([i]) * (50 + i) for i in range(10)]
    tbl = pa.table({"id": list(range(10)),
                    "image": pa.array(payloads, pa.binary()),
                    "audio": pa.array(payloads, pa.binary()),
                    "video": pa.array(payloads, pa.binary())})
    ds = ray.data.from_arrow(tbl)
    img = decode_images(ds, concurrency=1).to_pandas()
    assert len(img) == 10 and {"width", "height", "features"} <= set(img.columns)
    assert (img["width"] >= 64).all()
    aud = extract_audio_features(ds, concurrency=1).to_pandas()
    assert len(aud) == 10 and (aud["duration_ms"] > 0).all()
    vid = sample_video_frames(ds, every_n=10).to_pandas()
    assert (vid.groupby("id").size() >= 1).all()
    # determinism: same payload -> same features
    img2 = decode_images(ds, concurrency=1).to_pandas()
    assert img["features"].iloc[0] == pytest.approx(img2["features"].iloc[0])
    # real backend rejects junk payloads loudly (tests/test_multimodal.py
    # covers the real decode paths on valid PNG/WAV/PRVC payloads)
    with pytest.raises(Exception, match="not a PNG|RayTaskError|UserCode"):
        decode_images(ds, backend="real", concurrency=1).to_pandas()


def test_cosine_neardup_lsh_path(emb_ds):
    """The streaming LSH path (forced via exact_max_rows=0) must return
    only true pairs (precision 1: every pair is exact-verified) and
    recall the identical/near-identical pairs."""
    exact = cosine_neardup_pairs(emb_ds, threshold=0.4).to_pandas()
    truth = set(zip(exact["id_a"], exact["id_b"]))
    scores = dict(zip(zip(exact["id_a"], exact["id_b"]),
                      exact["score_1e6"]))
    # planes trade recall for bucket size: 4 planes x 8 tables gives
    # strong pairs (cos >= 0.9, collision prob (1-θ/π)^4 ≈ 0.54/table)
    # ~0.998 recall; the default 12 planes is calibrated for the
    # >= 0.9-threshold near-dup regime at corpus scale
    got = cosine_neardup_pairs(
        emb_ds, threshold=0.4, exact_max_rows=0,
        planes=4, num_tables=8).to_pandas()
    found = set(zip(got["id_a"], got["id_b"]))
    assert found, "LSH path found nothing"
    # precision: every LSH pair is a true pair with the exact score
    assert found <= truth
    for (a, b), s in zip(zip(got["id_a"], got["id_b"]), got["score_1e6"]):
        assert scores[(a, b)] == s
    strong = {p for p, s in scores.items() if s >= 900_000}
    if strong:
        assert len(found & strong) >= 0.9 * len(strong)
    # no duplicate pairs across tables
    assert len(got) == len(found)


def test_cosine_neardup_adaptive_default_switches(emb_ds, caplog):
    """Above exact_max_rows the DEFAULT behavior must switch to the
    approximate LSH path (with a loud warning) instead of running the
    O(B^2) exact matmul — the scale-safe default."""
    import logging

    with caplog.at_level(logging.WARNING,
                         logger="patapsco_ray.functions.similarity"):
        got = cosine_neardup_pairs(
            emb_ds, threshold=0.4, exact_max_rows=5,
            planes=4, num_tables=8).to_pandas()
    assert any("APPROXIMATE LSH path" in r.message for r in caplog.records)
    exact = cosine_neardup_pairs(
        emb_ds, threshold=0.4, exact_max_rows=None).to_pandas()
    truth = set(zip(exact["id_a"], exact["id_b"]))
    found = set(zip(got["id_a"], got["id_b"]))
    assert found and found <= truth


def test_ivf_topk_full_probe_is_exact(emb_ds):
    from patapsco_ray.functions.similarity import ivf_cosine_topk

    Q = np.asarray(
        pq.read_table(EMB).column("embedding").combine_chunks().flatten()
        .to_numpy(zero_copy_only=False)).reshape(500, -1)[:3]
    exact = cosine_topk(emb_ds, Q, query_ids=["a", "b", "c"],
                        k=5).to_pandas()
    # nprobe == ncentroids: every cell probed -> identical to exact
    got = ivf_cosine_topk(emb_ds, Q, query_ids=["a", "b", "c"], k=5,
                          ncentroids=8, nprobe=8).to_pandas()
    exact = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got["vec_id"].values == exact["vec_id"].values).all()
    assert (got["score_1e6"].values == exact["score_1e6"].values).all()


def test_ivf_topk_partial_probe_recall(emb_ds):
    from patapsco_ray.functions.similarity import (
        ivf_cosine_topk, train_ivf_centroids)

    Q = np.asarray(
        pq.read_table(EMB).column("embedding").combine_chunks().flatten()
        .to_numpy(zero_copy_only=False)).reshape(500, -1)[:3]
    exact = cosine_topk(emb_ds, Q, query_ids=["a", "b", "c"],
                        k=5).to_pandas()
    # pretrained centroids path + partial probe: valid approximate result
    C = train_ivf_centroids(emb_ds, ncentroids=8, seed=11)
    got = ivf_cosine_topk(emb_ds, Q, query_ids=["a", "b", "c"], k=5,
                          nprobe=4, centroids=C).to_pandas()
    hits = 0
    for qid, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert len(grp) <= 5
        assert (np.diff(grp["score_1e6"].values) <= 0).all()
        want_ids = set(exact[exact["query_id"] == qid]["vec_id"])
        hits += len(want_ids & set(grp["vec_id"]))
    assert hits >= 9, f"recall@5 too low: {hits}/15"
