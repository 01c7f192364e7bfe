"""Gopher-style repetition signals (stages/text.py gopher_repetition):
hand-computed values, null/empty edges, batching invariance."""



def test_gopher_repetition_hand_values(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages.text import (
        gopher_repetition,
    )
    t = pa.table({"doc_id": [1, 2, 3, 4, 5],
                  "text": ["a b\na b\nc", "x y x y x y", None, "",
                           "p1\n\np1\n\np2"]})
    out = gopher_repetition().apply(ray.data.from_arrow(t)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc1: lines [a b, a b, c] -> 2/3 dup occurrences, 6/7 dup chars;
    # words [a, b\na, b\nc] -> top bigram 'b\na b\nc' = 7 chars / 9
    assert abs(out.loc[0, "dup_line_frac"] - 2 / 3) < 1e-12
    assert abs(out.loc[0, "dup_line_char_frac"] - 6 / 7) < 1e-12
    assert abs(out.loc[0, "top_2gram_char_frac"] - 7 / 9) < 1e-12
    # doc2: 'x y' occurs 3x -> 9 chars / 11
    assert abs(out.loc[1, "top_2gram_char_frac"] - 9 / 11) < 1e-12
    assert out.loc[1, "dup_line_frac"] == 0.0
    # null text -> null metrics; empty text -> zeros
    assert np.isnan(out.loc[2, "dup_line_frac"])
    assert out.loc[3, "dup_line_frac"] == 0.0
    # doc5 paragraphs [p1, p1, p2] -> 2/3; lines [p1,'',p1,'',p2] -> 4/5
    assert abs(out.loc[4, "dup_para_frac"] - 2 / 3) < 1e-12
    assert abs(out.loc[4, "dup_line_frac"] - 4 / 5) < 1e-12
    # batching invariance: same answer at batch_size=1 shape (3 blocks)
    out3 = gopher_repetition().apply(
        ray.data.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out3[out.columns].round(12).equals(out.round(12))


def test_dsir_scores_reference_and_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages.dsir import dsir_scores
    rng = np.random.default_rng(7)
    # target docs (0-4) favor token 'alpha'; corpus docs mix
    def mk(i, words):
        return " ".join(rng.choice(words, size=40))
    texts = [mk(i, ["alpha", "beta"]) for i in range(5)] + \
            [mk(i, ["alpha", "beta", "gamma", "delta"]) for i in range(45)] \
            + ["short", None]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    tgt = lambda b: pc.less(b["doc_id"], 5)
    out = dsir_scores(ray.data.from_arrow(t), tgt).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # short + null docs contribute no rows
    assert set(out["doc_id"]) == set(range(50))
    # integer scores, deterministic under different parallelism
    out3 = dsir_scores(ray.data.from_arrow(t).repartition(5), tgt) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(out3)
    # docs drawn from the target distribution score higher on average
    # than the 4-word corpus docs (the DSIR selection signal)
    m_t = out[out["doc_id"] < 5]["dsir_score"].mean()
    m_c = out[out["doc_id"] >= 5]["dsir_score"].mean()
    assert m_t > m_c
