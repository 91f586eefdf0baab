"""Dump physical plans of headline queries → PLANS.md.

Plan-quality evidence for the engine (run after changing operators):
  * parquet scans show PushedFilters + pruned ReadSchema (never read `html`
    when only `text` is needed),
  * dimension joins are BroadcastHashJoin,
  * expression pipelines sit inside WholeStageCodegen spans,
  * the big-side token stages carry the intended partitioning.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e
    from bioner_spark.session import get_spark

    spark = get_spark(app_name="explain_plans")
    q = e.queries()
    picks = [
        "tokenize_offsets",      # narrow, shuffle-free; pruned scan
        "dict_mentions",         # gazetteer window + broadcast join + CC
        "kg_triples",            # full KG stage incl. pair self-join
        "span_decode",           # window state machine
        "ngram_vocab",           # explode → partial/final hash agg
        "lsh_candidates",        # banded self-join
        "cosine_topk",           # broadcast + higher-order funcs
        "ivf_topk",              # cell-pruned ANN
        "jaccard_pairs",         # standalone shingle self-join verify
        "near_dup_clusters",     # LSH -> set-intersect verify -> components
        "decontamination",       # broadcast benchmark n-gram semi join
        "kg_degree",             # per-metric distinct-then-count joins
                                 # (r5: Expand-free — check NO Expand node)
        "kg_pmi",                # pair counts + partitioned window marginals
        "corpus_filter",         # composed chain: ONE corpus scan, cached
                                 # word-array base (InMemoryTableScan) reused
                                 # by exact-dup/near-dup/decontamination
    ]
    out = [
        "# PLANS — physical plans of headline queries",
        "",
        f"`df.explain('formatted')` at `{sf_dir}`. Regenerate:",
        "`python scripts/explain_plans.py`. Things to check when editing:",
        "PushedFilters / pruned ReadSchema on every parquet scan,",
        "BroadcastHashJoin for dimension joins, wide WholeStageCodegen spans,",
        "no unexpected Exchange on the token-table spine.",
        "",
    ]
    checks = []
    for name in picks:
        txt = plan_text(q[name](spark, sf_dir))
        out += [f"## {name}", "", "```", txt.rstrip(), "```", ""]
        # formatted mode marks WSCG as [codegen id : N]; un-executed AQE
        # plans hide codegen markers until runtime, so report n/a there
        cg = "yes" if "codegen id" in txt else (
            "n/a (AQE)" if "AdaptiveSparkPlan" in txt else "NO"
        )
        checks.append(
            (
                name,
                "Broadcast" in txt,
                cg,
                # SHUFFLE exchanges only: '\bExchange' has a word boundary
                # before 'E' in '+- Exchange (4)' but not inside
                # 'BroadcastExchange (3)'/'ReusedExchange (3)', so broadcasts
                # and reuses are excluded and nothing double-counts
                len(re.findall(r"\bExchange ", txt)),
            )
        )
    out += ["## Summary", "", "| query | broadcast | codegen | exchanges |", "|---|---|---|---|"]
    for name, bc, cg, ex in checks:
        out.append(f"| {name} | {'yes' if bc else '—'} | {cg} | {ex} |")
    out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
