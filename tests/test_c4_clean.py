"""C4 heuristic cleaning (stages/text.c4_clean): every rule pinned on
handcrafted lines, boundary at exactly 3 retained lines, null contract."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.text import c4_clean

GOOD = "this line has at least five words."          # kept
NOPUNCT = "this line has five good words"            # no terminal punct
SHORT = "too few words."                             # < 5 words
JS = "enable javascript to view this page."          # javascript
BANG = "five words ending in a bang!"                # kept
QUEST = "does this line have five words?"            # kept
QUOTE = 'he said "this line has five words."'        # kept (ends in .)
QUOTE_END = 'a line that ends with a quote mark"'    # kept (ends in ")


def _run(rows):
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": rows})
    out = c4_clean("text").apply(ray.data.from_arrow(t))
    return {r["doc_id"]: r for r in out.take_all()}


def test_line_rules():
    doc = "\n".join([GOOD, NOPUNCT, SHORT, JS, BANG, QUEST, QUOTE_END])
    got = _run([doc])[0]
    assert got["kept"] is True or got["kept"] == True  # noqa: E712
    assert got["n_lines_kept"] == 4
    assert got["clean_text"] == "\n".join([GOOD, BANG, QUEST, QUOTE_END])


def test_doc_rules():
    three = "\n".join([GOOD, BANG, QUEST])
    two = "\n".join([GOOD, BANG])
    lorem = three + "\nwe embed Lorem Ipsum somewhere."
    curly = three + "\nvar f = function() { return 1; };"
    got = _run([three, two, lorem, curly, None])
    assert got[0]["kept"] and got[0]["n_lines_kept"] == 3
    assert not got[1]["kept"] and got[1]["clean_text"] is None
    assert got[1]["n_lines_kept"] == 2          # counts still reported
    assert not got[2]["kept"]                   # lorem ipsum page drop
    assert not got[3]["kept"]                   # '{' page drop
    assert not got[4]["kept"]
    assert got[4]["n_lines_kept"] is None and got[4]["clean_text"] is None


def test_case_insensitive_rules():
    doc = "\n".join([GOOD, BANG, QUEST,
                     "this page uses JavaScript heavily today."])
    got = _run([doc])[0]
    # the JS line is dropped case-insensitively but the page survives
    assert got["kept"] and got["n_lines_kept"] == 3
