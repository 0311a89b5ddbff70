"""Paragraph-level corpus dedup (operators/paragraph_dedup.py).

RefinedWeb / MassiveText line-dedup semantics (arXiv:2306.01116
§3.2): every occurrence of a corpus-wide repeated paragraph is
dropped; survivors reassemble in original order.
"""

from __future__ import annotations

import pytest

from bdqc_spark.operators.paragraph_dedup import paragraph_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = paragraph_dedup(df, "doc_id", "text", **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _twin(rows, min_count=2):
    """Single-node reference: split on blank lines, trim, drop empties,
    count corpus-wide, drop every occurrence of hot paragraphs."""
    import re
    from collections import Counter

    paras = {
        d: [p.strip() for p in re.split(r"\n{2,}", t) if p.strip()] for d, t in rows
    }
    counts = Counter(p for ps in paras.values() for p in ps)
    out = {}
    for d, ps in paras.items():
        if not ps:
            continue  # no paragraph rows -> absent from output (documented)
        kept = [p for p in ps if counts[p] < min_count]
        out[d] = {
            "doc_id": d,
            "n_paragraphs": len(ps),
            "n_dropped": len(ps) - len(kept),
            "text_deduped": "\n\n".join(kept),
        }
    return out


BOILER = "We use cookies to improve your experience."


def test_boilerplate_dropped_everywhere_unique_kept(spark):
    rows = [
        ("a", f"Unique intro A.\n\n{BOILER}\n\nUnique body A."),
        ("b", f"{BOILER}\n\nUnique body B."),
        ("c", "Totally unique document C."),
    ]
    got = _run(spark, rows)
    assert got == _twin(rows)
    assert got["a"]["text_deduped"] == "Unique intro A.\n\nUnique body A."
    assert got["b"]["n_dropped"] == 1
    assert got["c"]["n_dropped"] == 0


def test_within_doc_repeats_count_toward_threshold(spark):
    # the repeated paragraph appears twice in ONE doc -> corpus count 2
    rows = [("a", "Repeat me.\n\nmiddle\n\nRepeat me."), ("b", "other")]
    got = _run(spark, rows)
    assert got == _twin(rows)
    assert got["a"]["text_deduped"] == "middle"
    assert got["a"]["n_dropped"] == 2


def test_whitespace_and_separator_runs_normalized(spark):
    # trailing spaces + 3-newline separators must not defeat equality
    rows = [
        ("a", f"  {BOILER}  \n\n\n\nkeep a"),
        ("b", f"{BOILER}\n\nkeep b"),
    ]
    got = _run(spark, rows)
    assert got["a"]["text_deduped"] == "keep a"
    assert got["b"]["text_deduped"] == "keep b"


def test_all_paragraphs_dropped_yields_empty_text(spark):
    rows = [("a", BOILER), ("b", BOILER)]
    got = _run(spark, rows)
    for d in ("a", "b"):
        assert got[d] == {
            "doc_id": d,
            "n_paragraphs": 1,
            "n_dropped": 1,
            "text_deduped": "",
        }


def test_empty_doc_absent_from_output(spark):
    rows = [("a", "   \n\n  "), ("b", "real text")]
    got = _run(spark, rows)
    assert "a" not in got and got["b"]["n_dropped"] == 0


def test_min_count_threshold(spark):
    rows = [("a", f"{BOILER}\n\nx"), ("b", BOILER), ("c", BOILER)]
    # min_count=4 > 3 occurrences -> nothing dropped
    got = _run(spark, rows, min_count=4)
    assert got["b"]["n_dropped"] == 0
    assert got == _twin(rows, min_count=4)
    got2 = _run(spark, rows, min_count=3)
    assert got2 == _twin(rows, min_count=3)
    with pytest.raises(ValueError):
        _run(spark, rows, min_count=1)


def test_order_preserved_many_paragraphs(spark):
    import random

    rng = random.Random(7)
    paras = [f"unique paragraph number {i} {rng.random()}" for i in range(40)]
    rows = [("a", "\n\n".join(paras))]
    got = _run(spark, rows)
    assert got["a"]["text_deduped"] == "\n\n".join(paras)
    assert got["a"]["n_paragraphs"] == 40


def test_randomized_vs_twin(spark):
    import random

    rng = random.Random(11)
    pool = [f"shared-{i}" for i in range(6)] + [BOILER]
    rows = []
    for d in range(25):
        ps = []
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.4:
                ps.append(rng.choice(pool))
            else:
                ps.append(f"uniq-{d}-{rng.random()}")
        rows.append((f"d{d:02d}", "\n\n".join(ps)))
    assert _run(spark, rows) == _twin(rows)


def test_anti_path_is_broadcast_on_hash(spark):
    """r6 (r5 VERDICT #6): the hot-hash list broadcasts, so the
    non-hot survivors' anti-join and the candidate semi-join are
    map-side joins on the 8-byte hash — full-corpus paragraph text
    never shuffles on the anti path; only hot rows reach the exact
    (h, para) confirm."""
    from bdqc_spark.operators.paragraph_dedup import paragraph_dedup

    df = spark.createDataFrame([("a", "x\n\ny"), ("b", "x\n\nz")], "doc_id string, text string")
    out = paragraph_dedup(df, "doc_id", "text")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    anti_bhj = [
        ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln and "LeftAnti" in ln
    ]
    semi_bhj = [
        ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln and "LeftSemi" in ln
    ]
    assert anti_bhj, "non-hot anti-join must be a broadcast join on h"
    assert semi_bhj, "candidate semi-join must be a broadcast join on h"
