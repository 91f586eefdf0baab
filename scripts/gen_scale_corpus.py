"""Deterministic 10×-scale corpus for the probabilistic-suite verification
sweep (round-3 verdict item 6): 50,000 documents + 20,000 embeddings —
one order beyond the largest driver testdata (sf0.1: 5,000 / 2,000) — so
the MinHash banding, LSH hyperplane gating, and IVF routing are exercised
at a realistic cluster density while every oracle stays exactly computable.

Design constraints (why the text is shaped this way):
  * vocabulary is HUGE (per-position unique word ids), so two unrelated
    documents share no 3-gram shingle — the exact all-pairs oracles
    (shingle self-join) stay sparse at 50k docs instead of exploding;
  * deliberate duplicate structure: every 25th doc is an EXACT copy of
    doc_id−2 (exact-dedup work), every 10th a MUTATION of doc_id−1 with a
    deterministic replacement rate sweeping Jaccard across the 0.8
    near-dup threshold from both sides (recall stress on the banding);
  * half the docs interleave English stopwords BETWEEN unique words —
    lang/quality branches get both outcomes without ever creating a
    shared 3-gram (every 3-gram contains a unique word);
  * embeddings: deterministic integer-lattice floats with every 13th
    vector a small perturbation of its predecessor (near-dup families for
    the hyperplane-banded gate).

Everything is a closed-form function of (doc_id, position) — no RNG state,
re-runs are byte-identical. Writes documents.parquet + embeddings.parquet
into the target dir and symlinks the remaining sf0.1 tables so
scripts/verify_oracle.py runs unchanged:

    python scripts/gen_scale_corpus.py /tmp/bioner_sf1
    python scripts/verify_oracle.py /tmp/bioner_sf1 dedup_exact lsh_candidates ...
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

_STOP = ["the", "and", "of", "to", "in", "is", "it", "that"]


def _doc_words(i: int) -> list[str]:
    """Base word list for doc i: length 30..199, per-position unique ids;
    every other doc interleaves stopwords (lang coverage) in a way that
    never creates a cross-doc 3-gram."""
    L = 30 + (i * 37) % 170
    words = [f"w{(i * 104729 + j * 7919) % 100_000_000:08d}" for j in range(L)]
    if i % 2 == 0:
        out = []
        for j, w in enumerate(words):
            out.append(w)
            out.append(_STOP[(i + j) % len(_STOP)])
        words = out
    return words


_MUTATE_STRIDES = (12, 27, 40, 80, 150)


def _mutate(words: list[str], i: int) -> list[str]:
    """Replace every k-th word with a fresh unique id. Each replaced word
    breaks the ~3 shingles containing it, so 3-gram-shingle Jaccard ≈
    (1-3/k)/(1+3/k): the stride cycle lands pairs at ≈0.60, 0.80, 0.86,
    0.93, 0.96 — BELOW, AT, and ABOVE the 0.8 near-dup threshold. (An
    earlier version computed k = 3 + (i % 10) at a call site where i % 10
    was always 9 — constant k=12, every pair at ≈0.6, so the sweep never
    exercised above-threshold banding recall at all.)"""
    k = _MUTATE_STRIDES[(i // 10) % len(_MUTATE_STRIDES)]
    out = list(words)
    for j in range(0, len(out), k):
        out[j] = f"m{(i * 7919 + j * 31) % 100_000_000:08d}"
    return out


def gen_documents() -> pa.Table:
    texts, langs, sources = [], [], []
    cache: dict[int, list[str]] = {}
    for i in range(N_DOCS):
        # exact-dup residue 13 (mod 25) NEVER collides with the near-dup
        # residue 9 (mod 10): 13 and 38 (mod 50) end in 3/8. The previous
        # residue 24 captured every i ≡ 49 (mod 50) — exactly the docs the
        # stride cycle below assigns k=150 — so the ≈0.96-Jaccard family
        # was silently never generated and 1 in 5 intended mutations
        # became an exact copy.
        if i % 25 == 13 and i >= 2:
            words = cache[i - 2]  # exact duplicate
        elif i % 10 == 9 and i >= 1:
            words = _mutate(cache[i - 1], i)  # near-duplicate
        else:
            words = _doc_words(i)
        cache[i] = words
        # bound the cache: only the last two docs are ever referenced
        cache.pop(i - 3, None)
        texts.append(" ".join(words))
        langs.append(["en", "en", "de", "fr"][i % 4])
        sources.append(f"src{i % 7}")
    n_chars = [len(t) for t in texts]
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
        }
    )


def gen_embeddings() -> pa.Table:
    # seeded PCG64 base matrix: every non-family row is distinct. The
    # previous integer lattice ((i*131 + k*31 + 17) % 2000) was PERIODIC
    # in vec_id with period 2000, so 82% of the 20k rows were byte-exact
    # copies of an earlier row — the banded near-dup sweep mostly measured
    # trivial exact matches, and top-k verification sat on cos=1.0 tie
    # plateaus at the k boundary. NEP 19 guarantees the PCG64 stream is
    # stable across numpy versions, so the corpus stays reproducible.
    rng = np.random.default_rng(20260819)
    m = rng.uniform(-1.0, 1.0, size=(N_VECS, DIM)).astype(np.float32)
    fam = (np.arange(N_VECS) % 13) == 12
    # perturbation must NEVER be exactly 0 (idx % 7 == 3 would yield a
    # byte-exact duplicate instead of the near-duplicate the docstring
    # promises, weakening the banded near-dup recall stress) — remap the
    # zero step to +4/997
    step = np.where(fam)[0][:, None] % 7 - 3
    step = np.where(step == 0, 4, step)
    m[fam] = m[np.where(fam)[0] - 1] + (step / 997.0).astype(np.float32)
    emb = pa.array(list(m), type=pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": emb,
            "label": pa.array((np.arange(N_VECS) % 16).astype(np.int32)),
        }
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bioner_sf1"
    # abspath: symlink targets resolve relative to the LINK's directory,
    # so a relative src_dir would mint 8 dangling links under out_dir
    src_dir = os.path.abspath(
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    )
    # realpath, not abspath: a symlinked out_dir pointing AT src_dir would
    # pass an abspath comparison and destroy the source through the link
    if os.path.realpath(out_dir) == os.path.realpath(src_dir):
        raise SystemExit(
            "gen_scale_corpus: out_dir must differ from src_dir — writing "
            "in place would overwrite documents/embeddings and unlink every "
            "other source table to replace it with a self-pointing symlink"
        )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(gen_documents(), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(), os.path.join(out_dir, "embeddings.parquet"))
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        dst = os.path.join(out_dir, f"{name}.parquet")
        # lexists, not exists: exists() follows the link, so a DANGLING
        # symlink from a prior run with a moved src_dir reads as absent and
        # os.symlink then dies with FileExistsError; replace it instead
        if os.path.lexists(dst):
            os.unlink(dst)
        os.symlink(os.path.join(src_dir, f"{name}.parquet"), dst)
    print(f"wrote {N_DOCS} docs + {N_VECS} embeddings to {out_dir}")


if __name__ == "__main__":
    main()
