"""Generate the committed tiny ``.pt`` checkpoint fixture + golden logits.

The fixture is a stacked-BiLSTM-with-BatchNorm model (the reference's most
general architecture) at toy sizes, seeded, exported with reference
parameter names in the documented torch-zip layout — so
tests/test_torch_import.py can verify the torch-free loader end to end:
file → state_dict → SequenceModel → forward logits == committed goldens.

Run from the repo root: python scripts/gen_pt_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioner_spark.ner.kernel import init_model  # noqa: E402
from bioner_spark.ner.torch_import import (  # noqa: E402
    model_to_state_dict,
    write_state_dict_pt,
)

FIX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)
PT_PATH = os.path.join(FIX_DIR, "datexis_tiny.pt")
GOLD_PATH = os.path.join(FIX_DIR, "datexis_tiny_golden.json")

INPUT_DIM, FF, LSTM, LAYERS = 12, 10, 6, 2
SEED = 20260817


def main() -> None:
    model = init_model(
        INPUT_DIM,
        feedforward_size=FF,
        lstm_size=LSTM,
        n_bilstm_layers=LAYERS,
        seed=SEED,
        batch_norm=True,
        name="pt_fixture",
    )
    write_state_dict_pt(PT_PATH, model_to_state_dict(model))

    # golden: two sequences (lengths 5 and 3) of deterministic inputs;
    # logits from THIS model (the generator's numpy authority) rounded to 6
    rng = np.random.default_rng(SEED + 1)
    x = rng.normal(size=(2, 5, INPUT_DIM)).astype(np.float32)
    lengths = np.array([5, 3])
    logits = model.forward(x, lengths)
    gold = {
        "input": x.tolist(),
        "lengths": lengths.tolist(),
        "logits": [
            np.round(logits[i, : lengths[i]].astype(np.float64), 6).tolist()
            for i in range(2)
        ],
    }
    with open(GOLD_PATH, "w") as f:
        json.dump(gold, f)
    print(f"wrote {PT_PATH} ({os.path.getsize(PT_PATH)} bytes) + goldens")


if __name__ == "__main__":
    main()
