"""Gopher A1 quality rules (stages/text.gopher_quality): each rule pinned
on a handcrafted doc, exact-ratio checks, null contract."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.text import gopher_quality

GOOD = ("the quick brown fox jumps over and over the lazy dog "
        "with plenty of ordinary words that keep flowing along")


def _run(rows, **kw):
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": rows})
    out = gopher_quality("text", min_words=10, **kw).apply(
        ray.data.from_arrow(t))
    return {r["doc_id"]: r for r in out.take_all()}


def test_rules_individually():
    docs = [
        GOOD,                                            # 0 kept
        "one two three four five.",                      # 1 too few words
        "## ### #### " + GOOD,                           # 2 symbol ratio
        "- b one\n- b two\n- b three\n• b four",         # 3 bullets (and words)
        GOOD + "\nto be continued...\nand more...",      # 4 ellipsis 2/3 lines
        "zz qq 77 !! ** (( )) [[ ]] %% ^^ @@",           # 5 alpha frac + stopwords
        None,                                            # 6 null
    ]
    got = _run(docs)
    assert got[0]["kept"]
    assert got[0]["n_words"] == 20
    assert got[0]["n_stop_distinct"] == 5  # the, and, with, of, that
    assert not got[1]["kept"] and got[1]["n_words"] == 5
    assert not got[2]["kept"] and got[2]["symbol_ratio"] > 0.1
    assert got[3]["bullet_line_frac"] == 1.0 and not got[3]["kept"]
    r4 = got[4]
    assert abs(r4["ellipsis_line_frac"] - 2 / 3) < 1e-12
    assert not r4["kept"]
    assert got[5]["alpha_word_frac"] < 0.8 and not got[5]["kept"]
    assert got[5]["n_stop_distinct"] == 0
    r6 = got[6]
    assert not r6["kept"]
    assert r6["n_words"] is None and r6["mean_word_len"] is None


def test_mean_word_length_bounds():
    shorty = " ".join(["ab"] * 20)          # mean 2 < 3
    longy = " ".join(["a" * 15] * 20)       # mean 15 > 10
    got = _run([shorty, longy], min_stopwords=0)
    assert not got[0]["kept"] and got[0]["mean_word_len"] == 2.0
    assert not got[1]["kept"] and got[1]["mean_word_len"] == 15.0


def test_configurable_thresholds():
    got = _run([GOOD], min_stopwords=6)
    assert not got[0]["kept"]               # only 5 distinct stopwords
