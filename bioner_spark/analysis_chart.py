"""Error-analysis chart: per-entity-length wrong-annotation ratios across
models, rendered as a grouped bar chart (reference analysis.py:396-418 —
the matplotlib `df.plot.bar` figure at the end of the error-analysis CLI).

Two halves, split the way a cluster job needs them split:

* :func:`error_length_chart_data` — the DISTRIBUTED part. One gold scan,
  one anti-join per model, output bounded by (#distinct entity lengths ×
  #models) — dozens of rows regardless of corpus size, so collecting the
  result to the driver for rendering is exactly as scale-safe as the
  reference collecting its pandas frame.
* :func:`render_error_length_chart` — the DRIVER part: a pure-stdlib SVG
  writer replacing matplotlib (not installed here, and a plotting lib has
  no business on executors anyway). Deterministic output: same rows in →
  byte-identical SVG out, which is what makes the chart testable.

Reference semantics kept: x axis is sorted entity length labeled
``"{length} ({human_format(total gold annotations)})"`` (analysis.py:
401-407), y is errors/total per model (analysis.py:245-251), model
columns are reordered to the reference's fixed publication order
(analysis.py:411) with one divergence — models not supplied are dropped
rather than plotted as empty NaN columns.
"""

from __future__ import annotations

import html
from typing import Dict, Iterable, List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

#: Reference publication order (analysis.py:411 `df.reindex(columns=...)`).
REFERENCE_MODEL_ORDER: Tuple[str, ...] = (
    "DATEXIS-NER", "BioNER", "SciBERT", "BioBERT",
)

# matplotlib's default color cycle (public: matplotlib rcParams
# 'axes.prop_cycle', tab10) — keeps the SVG visually comparable to the
# reference figure without importing matplotlib.
_COLORS = ("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
           "#9467bd", "#8c564b", "#e377c2", "#7f7f7f")

_SPAN_KEY = ["doc_id", "sentence_id", "start_tok", "end_tok"]


def human_format(num) -> str:
    """``1234 → '1.23K'``, ``1000 → '1K'`` — reference analysis.py:173-180
    (itself a public Stack Overflow snippet). Driver-side twin of
    ``metrics.human_format`` (the Spark-expression version) used for the
    tick labels, matching the reference's strip-trailing-zeros formatting
    exactly (the SQL version keeps fixed 2-decimal output)."""
    num = float("{:.3g}".format(num))
    magnitude = 0
    while abs(num) >= 1000 and magnitude < 4:
        # cap at 'T' — unbounded, a >=1e15 total would walk past the
        # 5-entry suffix list (IndexError); values below 1e15 unchanged
        magnitude += 1
        num /= 1000.0
    return "{}{}".format(
        "{:f}".format(num).rstrip("0").rstrip("."),
        ["", "K", "M", "B", "T"][magnitude],
    )


def error_length_chart_data(
    gold: DataFrame, model_spans: Dict[str, DataFrame]
) -> DataFrame:
    """Chart-ready rows ``(model, len, n_errors, n_total, error_ratio)``
    for every model in one DataFrame (reference analysis.py:188-203 +
    245-251, run once per model and stacked).

    The plan references gold once for the totals and once per model's
    anti-join — persist the gold frame BEFORE calling when the corpus is
    large (this function deliberately does not adopt a cache: the caller
    owns gold's lifecycle, see the comment below). Totals are gold-side,
    hence identical across models —
    exactly the reference's ``result.total_annotations`` reuse for the
    shared tick labels. Output cardinality is lengths×models (tiny), so
    the downstream collect in :func:`render_error_length_chart` is
    bounded no matter the corpus size.
    """
    if not model_spans:
        raise ValueError("error_length_chart_data: need at least one model")
    # no persist here: the caller owns the gold DataFrame's lifecycle —
    # persist gold spans BEFORE calling when the corpus is large (the plan
    # references gold once per model), so nothing leaks cached partitions
    # past the caller's control
    g = (
        gold.select(*_SPAN_KEY).distinct()
        .withColumn("len", F.col("end_tok") - F.col("start_tok") + 1)
    )
    totals = g.groupBy("len").agg(F.count(F.lit(1)).alias("n_total"))
    out = None
    for name, pred in model_spans.items():
        p = pred.select(*_SPAN_KEY).distinct()
        errs = g.join(p, _SPAN_KEY, "left_anti").groupBy("len").agg(
            F.count(F.lit(1)).alias("n_errors")
        )
        part = (
            totals.join(errs, "len", "left")
            .select(
                F.lit(name).alias("model"),
                F.col("len").cast("int").alias("len"),
                F.coalesce(F.col("n_errors"), F.lit(0)).alias("n_errors"),
                "n_total",
                F.round(
                    F.coalesce(F.col("n_errors"), F.lit(0)) / F.col("n_total"), 6
                ).alias("error_ratio"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def _order_models(names: Iterable[str],
                  preferred: Sequence[str] = REFERENCE_MODEL_ORDER) -> List[str]:
    names = set(names)
    ordered = [m for m in preferred if m in names]
    ordered += sorted(names - set(ordered))
    return ordered


def render_error_length_chart(
    rows: Iterable,
    path: str | None = None,
    width: int = 800,
    height: int = 600,
    model_order: Sequence[str] = REFERENCE_MODEL_ORDER,
) -> str:
    """Grouped-bar SVG of :func:`error_length_chart_data` output
    (reference analysis.py:396-418; 8×6in figure → 800×600px).

    ``rows``: any iterable of objects with ``model/len/n_errors/n_total/
    error_ratio`` fields (``df.collect()`` rows or plain tuples in that
    order). Returns the SVG text; also writes it to ``path`` if given.
    """
    recs = []
    for r in rows:
        if hasattr(r, "model"):
            recs.append((r.model, int(r.len), int(r.n_total),
                         float(r.error_ratio)))
        else:
            m, ln, _ne, nt, ratio = r
            recs.append((m, int(ln), int(nt), float(ratio)))
    if not recs:
        raise ValueError("render_error_length_chart: no rows")

    lengths = sorted({ln for _, ln, _, _ in recs})
    models = _order_models({m for m, _, _, _ in recs}, model_order)
    totals = {}
    ratios = {}
    for m, ln, nt, ratio in recs:
        prev = totals.setdefault(ln, nt)
        if prev != nt:
            raise ValueError(
                f"gold totals disagree across models at length {ln}: "
                f"{prev} vs {nt}"
            )
        # refuse duplicate (model, length) rows like the totals check
        # above refuses conflicting totals: last-write-wins would render
        # an arbitrary one of two conflicting ratios with no error (e.g.
        # two chart_data outputs for the same model name unioned)
        if (m, ln) in ratios and ratios[(m, ln)] != ratio:
            raise ValueError(
                f"conflicting ratios for model {m!r} at length {ln}: "
                f"{ratios[(m, ln)]} vs {ratio}"
            )
        ratios[(m, ln)] = ratio

    # layout ---------------------------------------------------------------
    ml, mr, mt, mb = 70, 20, 20, 110          # margins (mb fits 45° labels)
    plot_w, plot_h = width - ml - mr, height - mt - mb
    y_max = max(max(ratios.values()), 1e-9)
    # nice ceiling: smallest of 0.1 steps covering y_max, capped at 1.0
    y_top = min(1.0, (int(y_max * 10) + 1) / 10.0)
    n_groups, n_models = len(lengths), len(models)
    group_w = plot_w / n_groups
    bar_w = group_w * 0.8 / n_models          # pandas default bar width .8

    def x_of(gi: int, mi: int) -> float:
        return ml + gi * group_w + group_w * 0.1 + mi * bar_w

    def y_of(v: float) -> float:
        return mt + plot_h * (1 - v / y_top)

    e: List[str] = []
    e.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="DejaVu Sans, Helvetica, sans-serif" font-size="11">'
    )
    e.append(f'<rect width="{width}" height="{height}" fill="white"/>')

    # y axis + gridlines + ticks
    n_ticks = int(round(y_top * 10)) + 1
    for i in range(n_ticks):
        v = i / 10.0
        y = y_of(v)
        e.append(
            f'<line x1="{ml}" y1="{y:.1f}" x2="{width - mr}" y2="{y:.1f}" '
            f'stroke="#dddddd" stroke-width="1"/>'
        )
        e.append(
            f'<text x="{ml - 6}" y="{y + 4:.1f}" text-anchor="end">'
            f"{v:.1f}</text>"
        )
    e.append(
        f'<line x1="{ml}" y1="{mt}" x2="{ml}" y2="{mt + plot_h}" '
        f'stroke="black" stroke-width="1"/>'
    )
    e.append(
        f'<line x1="{ml}" y1="{mt + plot_h}" x2="{width - mr}" '
        f'y2="{mt + plot_h}" stroke="black" stroke-width="1"/>'
    )

    # bars
    color = {m: _COLORS[i % len(_COLORS)] for i, m in enumerate(models)}
    for gi, ln in enumerate(lengths):
        for mi, m in enumerate(models):
            v = ratios.get((m, ln), 0.0)
            x, y = x_of(gi, mi), y_of(v)
            h = mt + plot_h - y
            e.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w:.1f}" '
                f'height="{h:.1f}" fill="{color[m]}">'
                f"<title>{html.escape(m)} len={ln}: {v:.4f}</title></rect>"
            )

    # x tick labels: "length (human_format(total))", rotated 45° right-anchored
    # (analysis.py:401-407, 415)
    for gi, ln in enumerate(lengths):
        cx = ml + gi * group_w + group_w / 2
        ty = mt + plot_h + 14
        label = html.escape(f"{ln} ({human_format(totals[ln])})")
        e.append(
            f'<text x="{cx:.1f}" y="{ty}" text-anchor="end" '
            f'transform="rotate(-45 {cx:.1f} {ty})">{label}</text>'
        )

    # axis titles (analysis.py:413-414)
    e.append(
        f'<text x="{ml + plot_w / 2:.1f}" y="{height - 14}" '
        f'text-anchor="middle">Entity length (Total entities)</text>'
    )
    e.append(
        f'<text x="18" y="{mt + plot_h / 2:.1f}" text-anchor="middle" '
        f'transform="rotate(-90 18 {mt + plot_h / 2:.1f})">'
        f"Ratio of wrong annotations</text>"
    )

    # legend (upper right, matplotlib default placement)
    lx, ly = width - mr - 150, mt + 10
    e.append(
        f'<rect x="{lx - 8}" y="{ly - 14}" width="158" '
        f'height="{18 * len(models) + 8}" fill="white" stroke="#cccccc"/>'
    )
    for i, m in enumerate(models):
        yy = ly + i * 18
        e.append(
            f'<rect x="{lx}" y="{yy - 9}" width="12" height="12" '
            f'fill="{color[m]}"/>'
        )
        e.append(f'<text x="{lx + 18}" y="{yy + 1}">{html.escape(m)}</text>')
    e.append("</svg>")
    svg = "\n".join(e)
    if path is not None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(svg)
    return svg
