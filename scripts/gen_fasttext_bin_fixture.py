"""Generate the committed tiny fastText ``.bin`` fixture.

The matrix is the deterministic integer lattice (fasttext.fixture_matrix_int,
the same public formula the DuckDB oracle uses) over nwords + bucket rows,
scaled to float32 — so every expected word vector in
tests/test_fasttext_bin.py is recomputable exactly from the formula, with no
trained artifact and no fasttext library anywhere.

Run from the repo root: python scripts/gen_fasttext_bin_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioner_spark.ner.fasttext import LATTICE_SCALE, fixture_matrix_int  # noqa: E402
from bioner_spark.ner.fasttext_bin import write_bin  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "fasttext_tiny.bin",
)

# "</s>" first, as fastText's count-sorted dictionary places it for a
# corpus where every line ends with EOS; non-ASCII entries exercise the
# UTF-8 + signed-char FNV path end to end
WORDS = ["</s>", "the", "cancer", "gene", "protein", "cell", "naïve", "α-synuclein"]
COUNTS = [1000, 900, 500, 400, 300, 200, 50, 20]
BUCKET = 64
DIM = 8
MINN, MAXN = 3, 4


def main() -> None:
    matrix = (
        fixture_matrix_int(len(WORDS) + BUCKET, DIM) / LATTICE_SCALE
    ).astype("float32")
    write_bin(OUT, matrix, WORDS, COUNTS, minn=MINN, maxn=MAXN)
    print(f"wrote {OUT}: {os.path.getsize(OUT)} bytes "
          f"(nwords={len(WORDS)}, bucket={BUCKET}, dim={DIM})")


if __name__ == "__main__":
    main()
