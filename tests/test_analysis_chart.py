"""Error-analysis chart (reference analysis.py:396-418): distributed
chart-data law + deterministic SVG rendering."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from bioner_spark.analysis_chart import (
    REFERENCE_MODEL_ORDER,
    error_length_chart_data,
    human_format,
    render_error_length_chart,
)

SPAN_SCHEMA = "doc_id bigint, sentence_id int, start_tok int, end_tok int"


def _spans(spark, triples):
    return spark.createDataFrame(
        [(d, s, a, b) for d, s, a, b in triples], SPAN_SCHEMA
    )


@pytest.fixture(scope="module")
def chart_rows(spark):
    # gold: lengths 1 (×3), 2 (×2), 4 (×1)
    gold = _spans(spark, [
        (1, 0, 0, 0), (1, 0, 2, 2), (1, 1, 5, 5),
        (1, 0, 4, 5), (2, 0, 0, 1),
        (2, 1, 0, 3),
    ])
    # model A misses one len-1 and the len-4; model B misses both len-2
    m_a = _spans(spark, [
        (1, 0, 0, 0), (1, 0, 2, 2),
        (1, 0, 4, 5), (2, 0, 0, 1),
        (9, 9, 0, 0),                      # FP — must not affect gold totals
    ])
    m_b = _spans(spark, [
        (1, 0, 0, 0), (1, 0, 2, 2), (1, 1, 5, 5),
        (2, 1, 0, 3),
    ])
    df = error_length_chart_data(gold, {"BioNER": m_a, "DATEXIS-NER": m_b})
    return df.collect()


def test_chart_data_law(chart_rows):
    got = {(r.model, r.len): (r.n_errors, r.n_total, r.error_ratio)
           for r in chart_rows}
    assert got == {
        ("BioNER", 1): (1, 3, pytest.approx(1 / 3, abs=1e-6)),
        ("BioNER", 2): (0, 2, 0.0),
        ("BioNER", 4): (1, 1, 1.0),
        ("DATEXIS-NER", 1): (0, 3, 0.0),
        ("DATEXIS-NER", 2): (2, 2, 1.0),
        ("DATEXIS-NER", 4): (0, 1, 0.0),
    }
    # totals are gold-side: identical across models per length
    for ln in (1, 2, 4):
        assert got[("BioNER", ln)][1] == got[("DATEXIS-NER", ln)][1]


def test_human_format_reference_parity():
    # reference analysis.py:173-180 behavior, exercised at the magnitudes
    # the tick labels see
    assert human_format(0) == "0"
    assert human_format(7) == "7"
    assert human_format(999) == "999"
    assert human_format(1000) == "1K"
    assert human_format(1234) == "1.23K"
    assert human_format(999999) == "1M"       # .3g rounds up a magnitude
    assert human_format(1500000) == "1.5M"
    assert human_format(2_000_000_000) == "2B"
    assert human_format(3_000_000_000_000) == "3T"
    # >=1e15 clamps at 'T' instead of indexing past the suffix list
    assert human_format(10**15) == "1000T"


def test_svg_structure_and_determinism(chart_rows, tmp_path):
    out = tmp_path / "chart.svg"
    svg = render_error_length_chart(chart_rows, path=str(out))
    assert out.read_text() == svg
    assert render_error_length_chart(chart_rows) == svg  # deterministic

    root = ET.fromstring(svg)                 # valid XML
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f".//{ns}rect")
    bars = [r for r in rects if r.find(f"{ns}title") is not None]
    assert len(bars) == 3 * 2                 # lengths × models
    texts = [t.text for t in root.findall(f".//{ns}text")]
    assert "Ratio of wrong annotations" in texts
    assert "Entity length (Total entities)" in texts
    assert "1 (3)" in texts and "2 (2)" in texts and "4 (1)" in texts
    # reference column order: DATEXIS-NER legend entry precedes BioNER
    assert texts.index("DATEXIS-NER") < texts.index("BioNER")


def test_bar_heights_encode_ratios(chart_rows):
    svg = render_error_length_chart(chart_rows)
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    heights = {}
    for r in root.findall(f".//{ns}rect"):
        t = r.find(f"{ns}title")
        if t is None:
            continue
        name, rest = t.text.split(" len=")
        ln, ratio = rest.split(": ")
        heights[(name, int(ln))] = float(r.get("height"))
    # ratio 1.0 bars are tallest and equal; ratio 0 bars have height 0
    assert heights[("BioNER", 4)] == pytest.approx(
        heights[("DATEXIS-NER", 2)], abs=0.2)
    assert heights[("BioNER", 2)] == 0.0
    assert heights[("BioNER", 1)] == pytest.approx(
        heights[("BioNER", 4)] / 3, abs=0.5)


def test_total_mismatch_raises():
    rows = [("BioNER", 1, 1, 3, 0.33), ("SciBERT", 1, 1, 4, 0.25)]
    with pytest.raises(ValueError, match="totals disagree"):
        render_error_length_chart(rows)


def test_unknown_models_after_reference_order():
    rows = [("zzz-model", 1, 0, 2, 0.0), ("aaa-model", 1, 1, 2, 0.5),
            ("BioBERT", 1, 1, 2, 0.5)]
    svg = render_error_length_chart(rows)
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    texts = [t.text for t in root.findall(f".//{ns}text")]
    assert REFERENCE_MODEL_ORDER[3] == "BioBERT"
    i = texts.index
    assert i("BioBERT") < i("aaa-model") < i("zzz-model")
