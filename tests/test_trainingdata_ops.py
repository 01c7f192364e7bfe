"""Tests for the training-data operator families: text analysis, dedup
family (exact / minhash-LSH / simhash / embedding-cosine), similarity
search, multimodal plumbing, and the DQ framework."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.quality import checks
from e_commerce_batch_etl_pipeline_ray.stages import (
    multimodal,
    neardup,
    similarity,
    text,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill in the late afternoon sun ")


def _docs():
    rows = [
        {"doc_id": 0, "text": BASE * 3},
        {"doc_id": 1, "text": BASE * 3},                      # exact dup of 0
        {"doc_id": 2, "text": BASE * 3 + "extra tail words"},  # near dup of 0
        {"doc_id": 3, "text": "completely different content about databases "
                              "and distributed systems engineering at scale " * 3},
        {"doc_id": 4, "text": "der hund und die katze sind in dem haus und "
                              "sie schlafen unter dem tisch mit einem ball " * 2},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


# --- text analysis ---------------------------------------------------------

def test_token_stats():
    out = text.token_stats().apply(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 22 * 3   # 22 words per BASE repeat
    assert (out["n_chars_text"] > 0).all()


def test_quality_score_bounds():
    out = text.quality_score().apply(_docs()).to_pandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert ((out["punct_ratio"] >= 0) & (out["punct_ratio"] <= 1)).all()


def test_lang_id():
    out = text.lang_id().apply(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[4, "lang_pred"] == "de"


def test_fingerprint_deterministic_and_sensitive():
    out = text.fingerprint().apply(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]   # same text
    assert out.loc[0, "fingerprint"] != out.loc[3, "fingerprint"]   # different


# --- dedup family ----------------------------------------------------------

def test_exact_dedup():
    out = neardup.exact_dedup().apply(_docs()).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4]   # doc 1 dropped (higher id)


def test_minhash_lsh_finds_near_dups():
    pairs = neardup.minhash_lsh_pairs(_docs(), threshold=0.7).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found and (0, 2) in found and (1, 2) in found
    assert not any(3 in p or 4 in p for p in found)


def test_dedup_by_pairs_transitive():
    ds = _docs()
    pairs = neardup.minhash_lsh_pairs(ds, threshold=0.7)
    kept = neardup.dedup_by_pairs(ds, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 3, 4]   # cluster {0,1,2} -> keep 0


def test_simhash_pairs():
    pairs = neardup.simhash_pairs(_docs(), max_hamming=6).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found
    assert not any({3, 4} & set(p) for p in found)


def test_ngram_jaccard_kernel():
    assert neardup.ngram_jaccard(BASE, BASE) == 1.0
    assert neardup.ngram_jaccard(BASE, "zzzz qqqq") < 0.05


def test_embedding_neardup():
    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    vecs = np.vstack([base, base[0] + rng.randn(16) * 0.01])  # 20 is ~dup of 0
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(21)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = neardup.embedding_neardup_pairs(ds, dim=16, threshold=0.98).to_pandas()
    assert (0, 20) in {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}


def test_embedding_neardup_n_tables_exact_recall():
    """At the recall-complete operating point (few planes x many tables) the
    SRP pipeline must return EXACTLY the numpy all-pairs ground truth —
    the invariant q46's DuckDB oracle checks at sf scale."""
    rng = np.random.RandomState(5)
    base = rng.randn(40, 16)
    vecs = np.vstack([base, base[:5] * 1.001 + rng.randn(5, 16) * 0.005])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(45)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = neardup.embedding_neardup_pairs(
        ds, dim=16, threshold=0.98, n_planes=6, n_tables=12).to_pandas()
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = vn @ vn.T
    truth = {(i, j) for i in range(45) for j in range(i + 1, 45)
             if sim[i, j] >= 0.98}
    assert {tuple(p) for p in zip(got["id_a"], got["id_b"])} == truth


# --- similarity search -----------------------------------------------------

def _emb_ds(n=100, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(n)]
    return ray.data.from_arrow(pa.Table.from_pylist(rows)), m


def test_knn_brute_exact():
    ds, m = _emb_ds()
    out = similarity.knn_brute(ds, ([0], m[[0]]), k=5).to_pandas()
    assert len(out) == 5
    assert out.iloc[0]["neighbor_id"] == 0 and out.iloc[0]["cosine"] == 1.0
    # verify against numpy ground truth
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn[0]
    expect = set(np.argsort(-sims)[:5])
    assert set(out["neighbor_id"]) == expect


def test_knn_ivf_recall():
    ds, m = _emb_ds(n=300)
    q = ([1, 2], m[[1, 2]])
    exact = similarity.knn_brute(ds, q, k=10).to_pandas()
    approx = similarity.knn_ivf(ds, q, k=10, n_centroids=8, nprobe=4).to_pandas()
    for qid in (1, 2):
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        assert len(e & a) / len(e) >= 0.6   # probing 4/8 buckets
    # self-neighbor always found
    assert approx[(approx.query_id == 1) & (approx.neighbor_id == 1)].shape[0] == 1


# --- multimodal plumbing ---------------------------------------------------

def test_decode_images_fake_plumbing():
    t = multimodal.fake_media_table(20, payload_bytes=1024)
    ds = ray.data.from_arrow(t)
    out = multimodal.decode_images(fake=True, batch_size=8).apply(ds).to_pandas()
    assert len(out) == 20
    assert out["width"].between(64, 255).all()
    assert out["features"].map(len).eq(8).all()


def test_image_codec_roundtrip():
    """Pure-numpy PPM and BMP codecs are exact inverses (incl. BMP row
    padding on non-multiple-of-4 widths)."""
    rng = np.random.RandomState(3)
    for w, h in [(5, 7), (8, 8), (33, 2)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal.decode_image_bytes(multimodal.encode_ppm(img))
                == img).all()
        assert (multimodal.decode_image_bytes(multimodal.encode_bmp(img))
                == img).all()
    # nearest-neighbor resize shape + corner identity
    big = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    small = multimodal.resize_nearest(big, 6, 8)
    assert small.shape == (8, 6, 3)
    assert (small[0, 0] == big[0, 0]).all()


def test_wav_codec_roundtrip():
    x = (np.sin(np.linspace(0, 50, 4000)) * 0.7).astype(np.float32)
    got, rate = multimodal.decode_wav_bytes(multimodal.encode_wav(x, 8000))
    assert rate == 8000
    assert len(got) == len(x)
    assert np.abs(got - x).max() < 1e-3          # PCM16 quantization only


def test_decode_images_real_kernels():
    """End-to-end Ray stage over REAL PPM/BMP/PNG/JPEG payloads: true
    dimensions, pixel-histogram features; WAV rows decode through
    DecodeAudio with header-true durations; unsupported magics raise with
    the library named."""
    t = multimodal.real_media_table(24, seed=11)
    assert set(t.filter(
        pa.compute.equal(t["media_type"], "image"))["mime"].to_pylist()) == {
        "image/x-portable-pixmap", "image/bmp", "image/png", "image/jpeg"}
    images = t.filter(pa.compute.equal(t["media_type"], "image"))
    out = multimodal.decode_images(fake=False, batch_size=8).apply(
        ray.data.from_arrow(images)).to_pandas()
    assert len(out) == len(images)
    # dimensions are the REAL encoded ones, not hash-derived
    for row, payload in zip(out.itertuples(), images["payload"].to_pylist()):
        img = multimodal.decode_image_bytes(payload)
        assert (row.height, row.width) == img.shape[:2]
    assert out["features"].map(len).eq(8).all()
    assert out["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-5).all()

    audio = t.filter(pa.compute.equal(t["media_type"], "audio"))
    aout = multimodal.decode_audio(fake=False, batch_size=8).apply(
        ray.data.from_arrow(audio)).to_pandas()
    assert (aout["duration_ms"] == 250).all()    # rate//4 samples at rate
    assert aout["audio_features"].map(len).eq(16).all()

    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.DecodeImage(fake=False)._decode_real(
            b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError):              # GIF decodes for REAL now
        multimodal.DecodeImage(fake=False)._decode_real(b"GIF87a trailer")
    with pytest.raises(NotImplementedError, match="soundfile"):
        multimodal.decode_wav_bytes(b"ID3\x04mp3 junk....")


def test_sample_frames_layout():
    t = multimodal.fake_media_table(6, payload_bytes=512)
    ds = ray.data.from_arrow(t)
    out = multimodal.sample_frames(n_frames=4, fake=True).apply(ds).to_pandas()
    assert len(out) == 24
    assert set(out["frame_no"]) == {0, 1, 2, 3}
    assert out["frame"].map(len).gt(0).all()


# --- DQ framework ----------------------------------------------------------

def _dirty_ds():
    rows = [
        {"id": "a", "qty": 5, "price": 10.0, "status": "ok", "year_ts": "2023-05-01"},
        {"id": "b", "qty": -1, "price": 5.0, "status": "ok", "year_ts": "2023-06-01"},
        {"id": None, "qty": 2, "price": 0.0, "status": "bogus", "year_ts": "1990-01-01"},
        {"id": "a", "qty": 3, "price": 1.0, "status": "ok", "year_ts": "2023-07-01"},
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.column_names.index("year_ts"), "year_ts",
                     t["year_ts"].cast(pa.timestamp("us")))
    return ray.data.from_arrow(t)


def test_dq_report_and_gate():
    cfg = checks.DQConfig(
        min_rows=1,
        max_null_pct={"id": 10.0},
        dup_keys=["id"],
        max_dup_pct=10.0,
        non_positive_cols=["qty", "price"],
        year_col="year_ts", year_range=(2000, 2030),
        whitelist={"status": ["ok", "shipped"]},
    )
    report, overall = checks.run_checks(_dirty_ds(), cfg)
    rep = {r["check_name"]: r for r in report.to_pylist()}
    assert rep["row_count"]["status"] == "PASS"
    assert rep["null_pct__id"]["status"] == "FAIL"         # 25% > 10%
    assert rep["non_positive__qty"]["metric_value"] == 1.0
    assert rep["non_positive__price"]["metric_value"] == 1.0
    assert rep["year_out_of_range"]["metric_value"] == 1.0
    assert rep["whitelist__status"]["metric_value"] == 1.0
    assert rep["dup_pct"]["status"] == "FAIL"              # 25% > 10%
    assert overall == "FAIL"
    with pytest.raises(checks.DataQualityError):
        checks.run_checks(_dirty_ds(), cfg, gate=True)


def test_dq_all_pass():
    cfg = checks.DQConfig(min_rows=1, max_null_pct={"qty": 50.0})
    report, overall = checks.run_checks(_dirty_ds(), cfg)
    assert overall == "PASS"


# --- deterministic sampling / split / mixture -------------------------------

def test_hash_sample_deterministic_and_layout_invariant():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    t = pa.table({"doc_id": pa.array(range(10_000), pa.int64())})
    a = sampling.hash_sample("doc_id", 0.3, seed=1).apply(
        ray.data.from_arrow(t)).to_pandas()
    b = sampling.hash_sample("doc_id", 0.3, seed=1).apply(
        ray.data.from_arrow(t).repartition(13)).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])     # layout-invariant
    assert 0.25 < len(a) / 10_000 < 0.35


def test_hash_split_total_and_disjoint():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    t = pa.table({"doc_id": pa.array(range(20_000), pa.int64())})
    out = sampling.hash_split("doc_id", [0.8, 0.1, 0.1],
                              ["train", "val", "test"], seed=7).apply(
        ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 20_000                              # total
    frac = out["split"].value_counts(normalize=True)
    assert 0.77 < frac["train"] < 0.83
    assert 0.08 < frac["val"] < 0.12 and 0.08 < frac["test"] < 0.12


def test_mixture_tags_and_rates():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    a = ray.data.from_arrow(pa.table({"i": pa.array(range(8000), pa.int64())}))
    b = ray.data.from_arrow(pa.table({"i": pa.array(range(8000), pa.int64())}))
    out = sampling.mixture([("a", a), ("b", b)], id_cols=["i", "i"],
                           fractions=[0.5, 0.125], seed=2).to_pandas()
    counts = out["_source"].value_counts()
    assert 0.45 * 8000 < counts["a"] < 0.55 * 8000
    assert 0.10 * 8000 < counts["b"] < 0.15 * 8000


def test_pack_sequences_budget_and_coverage():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import packing
    rng = np.random.RandomState(5)
    n = 3000
    toks = rng.randint(10, 400, size=n)
    toks[::97] = 700                                     # oversized docs
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "n_tokens": pa.array(toks, pa.int64())})
    out = packing.pack_sequences("doc_id", "n_tokens", budget=512,
                                 num_partitions=8).apply(
        ray.data.from_arrow(t)).to_pandas()
    assert len(out) == n                                 # every doc packed once
    assert out["doc_id"].is_unique
    per_pack = out.groupby("pack_id").agg(tokens=("n_tokens", "sum"),
                                          docs=("doc_id", "size"),
                                          over=("oversize", "any"))
    ok = per_pack[~per_pack["over"]]
    assert (ok["tokens"] <= 512).all()                   # budget respected
    assert (out[out.oversize].groupby("pack_id").size() == 1).all()
    # utilization: FFD should fill bins reasonably (not one doc per bin)
    assert ok["tokens"].mean() > 512 * 0.7

    # determinism under different block layout
    out2 = packing.pack_sequences("doc_id", "n_tokens", budget=512,
                                  num_partitions=8).apply(
        ray.data.from_arrow(t).repartition(11)).to_pandas()
    m1 = out.sort_values("doc_id")["pack_id"].tolist()
    m2 = out2.sort_values("doc_id")["pack_id"].tolist()
    assert m1 == m2


def test_ivf_index_build_and_search(tmp_path):
    """Persisted per-centroid partition layout: search reads only probed
    list directories and still finds the exact neighbors brute force finds
    (high-recall config: nprobe = n_centroids gives exact parity)."""
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    rng = np.random.RandomState(4)
    vecs = rng.randn(2000, 32)
    t = pa.table({"vec_id": pa.array(range(2000), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in vecs],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t)
    idx_dir = str(tmp_path / "ivf")
    similarity.ivf_index_build(ds, idx_dir, n_centroids=8)

    q = ([0, 7], vecs[[0, 7]])
    exact = similarity.knn_brute(ds, q, k=5).to_pandas()
    # full probe -> exact parity with brute force
    full = similarity.ivf_index_search(idx_dir, q, k=5, nprobe=8).to_pandas()
    assert full.values.tolist() == exact.values.tolist()
    # partial probe -> self is always found, recall stays high
    part = similarity.ivf_index_search(idx_dir, q, k=5, nprobe=3).to_pandas()
    for qid in (0, 7):
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        p = set(part[part.query_id == qid]["neighbor_id"])
        assert qid in p
        assert len(e & p) >= 3


def test_ivf_index_append_equals_rebuild(tmp_path):
    """Incremental append: build on half the corpus, append the other half
    -> search results identical to a from-scratch build over the full
    corpus WITH THE SAME quantizer (same centroids => same lists; append
    must only add files, never perturb). Drift check flags a shifted
    distribution."""
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import similarity

    rng = np.random.RandomState(4)
    vecs = rng.randn(2000, 32)

    def _ds(lo, hi):
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.array([r.tolist() for r in vecs[lo:hi]],
                                  pa.list_(pa.float64()))}))

    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    cent = similarity.ivf_index_build(_ds(0, 1000), inc_dir, n_centroids=8)
    rep = similarity.ivf_index_append(_ds(1000, 2000), inc_dir)
    assert rep["appended"] == 1000
    assert not rep["rebuild_recommended"]        # same distribution

    similarity.ivf_index_build(_ds(0, 2000), full_dir, centroids=cent)
    q = ([0, 7], vecs[[0, 7]])
    got = similarity.ivf_index_search(inc_dir, q, k=5, nprobe=8).to_pandas()
    exp = similarity.ivf_index_search(full_dir, q, k=5, nprobe=8).to_pandas()
    assert got.values.tolist() == exp.values.tolist()

    # a genuinely shifted distribution trips the drift flag
    shifted = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(2000, 2500), pa.int64()),
        "embedding": pa.array(
            [(r + 25.0).tolist() for r in rng.randn(500, 32)],
            pa.list_(pa.float64()))}))
    rep2 = similarity.ivf_index_append(shifted, inc_dir)
    assert rep2["rebuild_recommended"]


def test_dedup_by_pairs_long_chain_and_round_guard():
    import ray.data

    # a 12-node chain: needs ~11 propagation rounds; converges and keeps
    # only the minimum id
    docs = pa.table({"doc_id": pa.array(range(14), pa.int64()),
                     "text": ["t"] * 14})
    chain = pa.table({"id_a": pa.array(range(11), pa.int64()),
                      "id_b": pa.array(range(1, 12), pa.int64()),
                      "jaccard": pa.array([1.0] * 11)})
    kept = neardup.dedup_by_pairs(ray.data.from_arrow(docs),
                                  ray.data.from_arrow(chain),
                                  max_rounds=15)
    assert sorted(kept.to_pandas()["doc_id"]) == [0, 12, 13]

    # too few rounds -> loud failure, never silent wrong labels
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="did not converge"):
        neardup.dedup_by_pairs(ray.data.from_arrow(docs),
                               ray.data.from_arrow(chain),
                               max_rounds=3).to_pandas()


def test_decode_audio_plumbing():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import multimodal
    media = multimodal.fake_media_table(64, seed=3, payload_bytes=1024)
    ds = ray.data.from_arrow(media)
    out = multimodal.decode_audio(fake=True, batch_size=16).apply(ds).to_pandas()
    assert len(out) == 64
    assert out["duration_ms"].notna().all()
    assert all(len(f) == 16 for f in out["audio_features"])
    # deterministic
    out2 = multimodal.decode_audio(fake=True, batch_size=16).apply(
        ray.data.from_arrow(media).repartition(5)).to_pandas()
    a = out.sort_values("media_id")["audio_features"].tolist()
    b = out2.sort_values("media_id")["audio_features"].tolist()
    assert all(list(x) == list(y) for x, y in zip(a, b))
    # non-fake raises loudly
    import pytest as _pytest
    with _pytest.raises(Exception):
        multimodal.decode_audio(fake=False).apply(ds).materialize()


def test_redact_and_compression_ratio():
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": ["mail me at bob.smith+x@corp.example.org now",
                              "see https://example.com/a?b=1 and card 4111111111111111",
                              "plain prose with nothing sensitive"]})
    out = T.redact("text", out="red").apply(
        ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert out["red"][0] == "mail me at <EMAIL> now"
    assert out["red"][1] == "see <URL> and card <NUM>"
    assert out["red"][2] == docs["text"][2].as_py()

    rep = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["abc " * 500,                      # repetitive
                             "The quick brown fox jumps over the lazy dog; "
                             "entropy varies considerably across sentences."]})
    cr = T.compression_ratio().apply(
        ray.data.from_arrow(rep)).to_pandas().sort_values("doc_id")
    assert cr["compress_ratio"][0] < 0.1 < cr["compress_ratio"][1]


def test_allpairs_jaccard_exact_vs_bruteforce():
    """allpairs_jaccard must return EXACTLY the >= threshold pair set (recall
    1.0 by the prefix-filter guarantee, precision 1.0 by exact verify) —
    checked against driver-side brute force over every pair."""
    import itertools
    import random

    rng = random.Random(11)
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest looking for tasty food").split()
    docs = []
    for i in range(60):
        words = list(base)
        for _ in range(rng.randrange(0, 8)):      # 0-7 word edits
            words[rng.randrange(len(words))] = rng.choice(
                ["alpha", "beta", "gamma", "delta", "epsilon"])
        docs.append({"doc_id": i, "text": " ".join(words)})
    for i in range(60, 75):                       # unrelated docs
        docs.append({"doc_id": i, "text": " ".join(
            rng.choice(["zig", "zag", "quux", "blorp", "frob"])
            for _ in range(30))})

    thr = 0.8
    truth = {}
    for a, b in itertools.combinations(docs, 2):
        j = neardup.ngram_jaccard(a["text"], b["text"], k=5)
        if j >= thr:
            truth[(a["doc_id"], b["doc_id"])] = round(j, 6)
    assert truth, "fixture must contain true near-dup pairs"
    assert len(truth) < len(docs) * (len(docs) - 1) // 4, \
        "fixture must also contain sub-threshold pairs"

    ds = ray.data.from_arrow(pa.Table.from_pylist(docs)).repartition(4)
    got = neardup.allpairs_jaccard(ds, threshold=thr).to_pandas()
    got_pairs = {(int(r.id_a), int(r.id_b)): r.jaccard
                 for r in got.itertuples()}
    assert set(got_pairs) == set(truth)
    for p, j in truth.items():
        assert abs(got_pairs[p] - j) < 1e-9


def test_stratified_sample_rates_and_subset_of_hash_sample():
    """Per-stratum rates honored deterministically; a stratum at fraction f
    keeps EXACTLY the rows hash_sample(f) would keep (same hash, same
    seed) — so stratified membership is layout-invariant too."""
    from e_commerce_batch_etl_pipeline_ray.stages import sampling

    rows = [{"id": i, "s": ("a", "b", "c")[i % 3]} for i in range(3000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    kept = sampling.stratified_sample("id", "s", {"a": 0.2, "b": 1.0},
                                      default=0.0, seed=4).apply(ds) \
        .to_pandas()
    assert set(kept[kept.s == "b"].id) == {i for i in range(3000) if i % 3 == 1}
    assert (kept.s != "c").all()                     # default=0 drops stratum
    plain = sampling.hash_sample("id", 0.2, seed=4).apply(ds).to_pandas()
    assert set(kept[kept.s == "a"].id) == set(plain[plain.s == "a"].id)
    frac_a = len(kept[kept.s == "a"]) / 1000
    assert 0.12 < frac_a < 0.28


def test_tfidf_top_terms_ranks_distinctive_words():
    """A word unique to one doc must out-score corpus-wide words there;
    ubiquitous words (df == N) get idf ln(1) = 0."""
    docs = [
        {"doc_id": 0, "text": "shared words here plus zebra zebra zebra"},
        {"doc_id": 1, "text": "shared words here plus quasar"},
        {"doc_id": 2, "text": "shared words here plus nothing else"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(docs))
    out = text.tfidf_top_terms(ds, top_n=2).to_pandas()
    top0 = out[(out.doc_id == 0) & (out.rk == 1)].term.iloc[0]
    top1 = out[(out.doc_id == 1) & (out.rk == 1)].term.iloc[0]
    assert top0 == "zebra" and top1 == "quasar"
    shared = out[out.term == "shared"]
    assert (shared.score == 0).all() if len(shared) else True
    assert (out.groupby("doc_id").rk.max() <= 2).all()


def test_pca_fit_matches_numpy_exactly():
    """Distributed (n, sum, Gram) partials give the SAME covariance as
    single-machine numpy -> identical components (up to the pinned sign)
    and projections, at any block count."""
    import numpy as np
    from e_commerce_batch_etl_pipeline_ray.stages import embedding as E

    rng = np.random.default_rng(12)
    base = rng.normal(size=(400, 8))
    base[:, 0] *= 10.0   # dominant direction
    base[:, 1] *= 3.0
    tbl = pa.table({"embedding": pa.array([list(r) for r in
                                           base.astype(np.float32)],
                                          pa.list_(pa.float32()))})
    m64 = np.asarray(base.astype(np.float32), dtype=np.float64)
    cov = np.cov(m64, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref = evecs[:, order].T.copy()
    for i in range(3):
        j = np.argmax(np.abs(ref[i]))
        if ref[i, j] < 0:
            ref[i] = -ref[i]

    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        model = E.pca_fit(ds, n_components=3)
        assert np.allclose(model["components"], ref, atol=1e-9)
        assert np.allclose(model["explained_variance"], evals[order],
                           atol=1e-9)
        out = E.pca_transform(model, out="p").apply(ds).take_all()
        got = np.asarray([r["p"] for r in out], dtype=np.float64)
        exp = (m64 - m64.mean(axis=0)) @ ref.T
        # row order is not guaranteed across blocks — compare as sets via
        # lexicographic sort
        gs = got[np.lexsort(got.T)]
        es = exp.astype(np.float32)[np.lexsort(exp.astype(np.float32).T)]
        assert np.allclose(gs, es, atol=1e-4)


def test_kmeans_recovers_planted_clusters():
    import numpy as np
    from e_commerce_batch_etl_pipeline_ray.stages import embedding as E

    rng = np.random.default_rng(4)
    centers = np.array([[0.0] * 8, [20.0] * 8, [-20.0, 20.0] * 4])
    pts = np.concatenate([c + rng.normal(scale=0.5, size=(150, 8))
                          for c in centers])
    labels = np.repeat([0, 1, 2], 150)
    perm = rng.permutation(len(pts))
    pts, labels = pts[perm], labels[perm]
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array([list(r) for r in pts.astype(np.float32)],
                              pa.list_(pa.float32())),
        "true": pa.array(labels, pa.int64()),
    })).repartition(5)

    model = E.kmeans_fit(ds, k=3, max_iters=25, seed=3)
    # each found centroid is within noise of one planted center, all matched
    found = model["centroids"]
    matched = set()
    for c in centers:
        dist = np.linalg.norm(found - c, axis=1)
        j = int(np.argmin(dist))
        assert dist[j] < 1.0 and j not in matched
        matched.add(j)
    # assignment purity: every true cluster maps to exactly one label
    out = E.kmeans_assign(model["centroids"]).apply(ds).take_all()
    import collections
    by_true = collections.defaultdict(set)
    for r in out:
        by_true[r["true"]].add(r["cluster"])
    assert all(len(v) == 1 for v in by_true.values())
    assert len(set().union(*by_true.values())) == 3


def test_l2_normalize_rows():
    import numpy as np
    from e_commerce_batch_etl_pipeline_ray.stages import embedding as E

    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array([[3.0, 4.0], [0.0, 0.0]],
                              pa.list_(pa.float32()))}))
    out = E.l2_normalize().apply(ds).take_all()
    assert np.allclose(out[0]["embedding"], [0.6, 0.8])
    assert np.allclose(out[1]["embedding"], [0.0, 0.0])   # zero stays zero


def test_edit_distance_join_exact_vs_bruteforce():
    """FastSS join == brute-force banded Levenshtein on a corpus with
    substitutions, insertions, deletions, transpositions and far-apart
    strings; invariant to block count."""
    import itertools
    from e_commerce_batch_etl_pipeline_ray.stages import neardup

    strs = ["kitten", "sitten", "sitting", "mitten", "kitte",
            "xyzzyplugh", "hello-world", "hello_world", "hellp-world",
            "abcdefgh", "zbcdefgh", "abcdefghij", "completely-different"]
    rows = [{"doc_id": i, "key": s} for i, s in enumerate(strs)]
    expect = sorted(
        (a["doc_id"], b["doc_id"],
         neardup._levenshtein_banded(a["key"], b["key"], 2))
        for a, b in itertools.combinations(rows, 2)
        if neardup._levenshtein_banded(a["key"], b["key"], 2) <= 2)
    for nblocks in (1, 4):
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)) \
            .repartition(nblocks)
        got = neardup.edit_distance_join(ds, "key", id_col="doc_id",
                                         max_dist=2).take_all()
        got = sorted((r["id_a"], r["id_b"], r["dist"]) for r in got)
        assert got == expect
    # sanity on the reference itself: classic distances
    assert neardup._levenshtein_banded("kitten", "sitting", 3) == 3
    assert neardup._levenshtein_banded("kitten", "sitting", 2) == 3  # d+1 cap


def test_chunk_documents_edges():
    """Chunk boundaries: short doc -> one chunk; exact-length doc -> one
    chunk; one char over -> two with the configured overlap; empty text
    stays one empty chunk."""
    from e_commerce_batch_etl_pipeline_ray.stages import text as T

    rows = [
        {"doc_id": 1, "text": "a" * 10},
        {"doc_id": 2, "text": "b" * 16},          # == chunk -> 1 chunk
        {"doc_id": 3, "text": "c" * 17},          # chunk+1 -> 2 chunks
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "x" * 40},          # 16,12-step -> 3 chunks
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = T.chunk_documents(chunk_chars=16, overlap_chars=4).apply(ds) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    got = out.groupby("doc_id").size().to_dict()
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 3}
    d3 = out[out.doc_id == 3]
    assert d3.chunk_text.tolist() == ["c" * 16, "c" * 5]   # 12-char step
    d5 = out[out.doc_id == 5]
    # starts at 0, 12, 24; overlap of 4 chars between consecutive chunks
    assert d5.n_chars.tolist() == [16, 16, 16]
    assert out[out.doc_id == 4].chunk_text.tolist() == [""]


def test_contamination_planted_overlap():
    from e_commerce_batch_etl_pipeline_ray.stages import text as T

    bench_text = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        {"doc_id": 0, "text": bench_text},                    # the benchmark
        {"doc_id": 1, "text": bench_text},                    # exact copy -> 1.0
        {"doc_id": 2, "text": "zzz completely different qqq " * 5},  # -> 0.0
        {"doc_id": 3, "text": bench_text[:40] + " unrelated tail " * 10},
        {"doc_id": 4, "text": "short"},                       # < k chars
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    bench = pa.Table.from_pylist(rows[:1])
    out = {r["doc_id"]: r for r in
           T.contamination(ds, bench, k=16, cap=512).take_all()}
    assert out[0]["contamination"] == 1.0      # benchmark vs itself
    assert out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 0.0
    assert 0.0 < out[3]["contamination"] < 1.0
    assert out[4]["n_shingles"] == 1           # whole short text = 1 shingle


def test_bm25_topk_matches_bruteforce():
    """BM25 engine vs a per-doc Python reference on a corpus with known
    term distribution; deterministic tie order; block invariance."""
    import math

    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import retrieval

    docs = ["hash join table", "hash hash hash", "window agg window",
            "spark table scan", "totally unrelated words here",
            "hash window spark", "", "table table table table"]
    terms = ["hash", "window"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    def brute():
        toks = [d.split(" ") for d in docs]
        n = len(toks)
        avg = sum(len(x) for x in toks) / n
        out = []
        for i, tk in enumerate(toks):
            s = 0.0
            for term in terms:
                df = sum(1 for x in toks if term in x)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                tf = tk.count(term)
                s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avg))
            out.append((i, s))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:4]

    exp = brute()
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = [(r["doc_id"], r["score"])
               for r in retrieval.bm25_topk(ds, terms, k=4).take_all()]
        assert [g[0] for g in got] == [e[0] for e in exp]
        for g, e in zip(got, exp):
            assert abs(g[1] - e[1]) < 1e-9


def test_weighted_sample_and_topk_layout_invariant():
    """weighted_sample / weighted_top_k pick the SAME rows at any block
    layout, and the distributed top-k equals the driver-side race."""
    import pyarrow as pa

    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    n = 2_000
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    w = ((ids * 7) % 400 + 1).astype(np.float64)
    t = pa.table({"doc_id": ids, "wt": w})
    for parts in (1, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = sampling.weighted_sample("doc_id", "wt", 1 / 300.0,
                                       seed=3).apply(ds).to_pandas()
        u = sampling._unit_hash(ids, 3)
        exp = ids[u < np.minimum(1.0, w / 300.0)]
        assert sorted(got.doc_id) == sorted(exp.tolist())
        topk = sampling.weighted_top_k(ds, "doc_id", "wt", 25,
                                       seed=5).to_pandas()
        key = np.log(sampling._unit_hash_open(ids, 5)) / w
        order = np.lexsort((ids, -key))
        assert sorted(topk.doc_id) == sorted(ids[order[:25]].tolist())
    # expectation sanity: heavier rows win proportionally more often
    wins = np.zeros(2, np.int64)   # [light half, heavy half]
    for seed in range(30):
        topk = sampling.weighted_top_k(
            ray.data.from_arrow(t).repartition(4), "doc_id", "wt", 50,
            seed=100 + seed).to_pandas()
        heavy = w[np.searchsorted(ids, topk.doc_id.to_numpy())] > 200
        wins += np.array([(~heavy).sum(), heavy.sum()])
    assert wins[1] > wins[0] * 1.5, wins


def test_robust_stats_and_outlier_filter():
    """grouped_robust_stats == pandas median/MAD at any layout; the
    inlier/outlier modes partition the rows; MAD=0 collapses the band
    to the exact median."""
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages import aggregates
    rng = np.random.default_rng(8)
    n = 3_000
    g = np.array(["ab"[i % 2] for i in range(n)])
    x = np.where(g == "a", rng.integers(90, 110, n),
                 rng.integers(0, 1000, n)).astype(np.int64)
    x[:5] = 10_000                               # planted outliers in both
    t = pa.table({"g": pa.array(g), "x": pa.array(x, pa.int64()),
                  "rid": pa.array(np.arange(n), pa.int64())})
    df = pd.DataFrame({"g": g, "x": x})
    exp = (df.groupby("g")["x"]
           .agg(median="median",
                mad=lambda s: (s - s.median()).abs().median(), n="count")
           .reset_index())
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (aggregates.grouped_robust_stats(["g"], "x", 4).apply(ds)
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert got[["g", "median", "mad", "n"]].astype(
            {"median": float, "mad": float, "n": "int64"}).equals(
            exp.astype({"median": float, "mad": float, "n": "int64"}))
    ds = ray.data.from_arrow(t).repartition(5)
    inl = aggregates.robust_outlier_filter(["g"], "x", c=3.0).apply(
        ds).to_pandas()
    out = aggregates.robust_outlier_filter(["g"], "x", c=3.0,
                                           keep="outliers").apply(
        ds).to_pandas()
    assert len(inl) + len(out) == n
    assert set(inl.rid) | set(out.rid) == set(range(n))
    assert set(range(5)) <= set(out.rid)         # planted outliers caught
    med = exp.set_index("g")
    for _, r in out.iterrows():
        assert abs(r.x - med.loc[r.g, "median"]) > 3.0 * med.loc[r.g, "mad"]
    # MAD = 0: constant group keeps only the exact median value
    t0 = pa.table({"g": pa.array(["c"] * 10 + ["c"]),
                   "x": pa.array([7] * 10 + [8], pa.int64())})
    kept = aggregates.robust_outlier_filter(["g"], "x", c=5.0).apply(
        ray.data.from_arrow(t0)).to_pandas()
    assert sorted(kept.x) == [7] * 10
    import pytest as _pytest
    with _pytest.raises(ValueError, match="keep"):
        aggregates.robust_outlier_filter(["g"], "x", keep="bogus")


def test_fingerprint_vectorized_batch_equals_per_doc_reference():
    """Round-5: the cross-doc vectorized Fingerprint.__call__ must stay
    bit-identical to the per-doc _fp reference across every branch —
    null, empty, <k, ==k, short (<window), window boundary, long,
    repeated text (duplicate minima)."""
    import numpy as np
    import pyarrow as pa

    from e_commerce_batch_etl_pipeline_ray.stages.text import Fingerprint

    rng = np.random.default_rng(77)
    texts = [None, "", "ab", "abcdefg", "abcdefgh",
             "abcdefghijklmnopqrstu", "z" * 100,
             "x" * 7 + "abcdefghijklmnopqrstuvwxyz" * 3,
             "".join(rng.choice(list("ab"), 23))]
    texts += [None if rng.random() < 0.1 else
              "".join(rng.choice(list("abcdefgh "),
                                 size=int(rng.integers(0, 120))))
              for _ in range(200)]
    fp = Fingerprint("text")
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = fp(t)["fingerprint"].to_pylist()
    exp = [fp._fp(v) for v in texts]
    assert got == exp
