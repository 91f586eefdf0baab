"""Vectorized numpy forward pass for the reference's sequence models.

Torch is not available in this environment (SURVEY.md §7), so the engine
re-implements inference-only forwards with numpy, matching the reference
architectures:

  * DATEXIS-NER (reference bioner/model/datexis_model.py:15-63):
    FF(150)+ReLU → BiLSTM(20) → LSTM(20) → Linear(3)
  * Stacked variant (datexis_model.py:66-167): + k extra BiLSTMs
  * BioNER (reference bioner/model/bioner_model.py:16-80):
    FF(2048)+ReLU → 3× BiLSTM(1024) → LSTM(1024) → Linear(3)
    (dropout is identity at inference)

pack_padded_sequence semantics (datexis_model.py:55-58) are reproduced
mask-aware: the backward direction of each BiLSTM reverses every sequence by
its true length, so pad steps never pollute valid outputs; forward
directions are causal so pads past a sequence's length are simply discarded.

Everything is batched matmul over [B, T, D] — no per-token Python loops
except the T-step recurrence itself (inherent to LSTMs).

Weight layout per LSTM direction follows the torch convention:
W_ih [4H, D], W_hh [4H, H], b [4H]; gate order i, f, g, o.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # clip keeps exp() finite; exact for |x| < 60 in float32/64
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60.0, 60.0)))


def lstm_forward(
    x: np.ndarray, w_ih: np.ndarray, w_hh: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Unidirectional LSTM over padded batch x [B, T, D] → [B, T, H]."""
    B, T, _ = x.shape
    H = w_hh.shape[1]
    h = np.zeros((B, H), dtype=x.dtype)
    c = np.zeros((B, H), dtype=x.dtype)
    out = np.empty((B, T, H), dtype=x.dtype)
    xg = x @ w_ih.T + b  # precompute input contributions [B, T, 4H]
    for t in range(T):
        gates = xg[:, t, :] + h @ w_hh.T
        i = _sigmoid(gates[:, :H])
        f = _sigmoid(gates[:, H : 2 * H])
        g = np.tanh(gates[:, 2 * H : 3 * H])
        o = _sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        h = o * np.tanh(c)
        out[:, t, :] = h
    return out


def _reverse_by_length(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """rev[i, :L] = x[i, L-1::-1]; pads stay in place (packed-seq semantics)."""
    out = x.copy()
    for i, L in enumerate(lengths):
        if L:  # L=0: x[i, -1::-1] is the FULL reversed row → broadcast crash
            out[i, :L] = x[i, L - 1 :: -1]
    return out


def bilstm_forward(
    x: np.ndarray,
    lengths: np.ndarray,
    fwd: tuple[np.ndarray, np.ndarray, np.ndarray],
    bwd: tuple[np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    """Bidirectional LSTM → [B, T, 2H]; length-aware backward direction."""
    out_f = lstm_forward(x, *fwd)
    rev = _reverse_by_length(x, lengths)
    out_b = _reverse_by_length(lstm_forward(rev, *bwd), lengths)
    return np.concatenate([out_f, out_b], axis=-1)


def batchnorm_infer(x: np.ndarray, bn: tuple) -> np.ndarray:
    """BatchNorm1d at INFERENCE: per-channel affine with running stats —
    y = gamma * (x - mean) / sqrt(var + eps) + beta. The reference permutes
    to [B, C, T] because torch's BatchNorm1d normalizes dim 1
    (datexis_model.py:182-188); element-wise over channels, that equals
    broadcasting over the trailing feature axis here — no permute needed."""
    gamma, beta, mean, var, eps = bn
    return gamma * (x - mean) / np.sqrt(var + eps) + beta


@dataclass
class SequenceModel:
    """Inference-only weights for the DATEXIS/BioNER family.

    Optional BatchNorm (reference StackedBiLSTMModel with
    batch_normalization_enabled, datexis_model.py:105-109, 132-167): each
    bn field is None or (gamma, beta, running_mean, running_var, eps).
    Placement mirrors the reference forward exactly — after the FF layer
    (PRE-ReLU, :134-138), after EVERY BiLSTM incl. the first (:142-156),
    and after the encoder LSTM (:158-161). Dropout between layers is
    identity at inference."""

    ff_w: np.ndarray  # [F, D_in]
    ff_b: np.ndarray  # [F]
    bilstms: list  # list of (fwd=(w_ih,w_hh,b), bwd=(w_ih,w_hh,b))
    enc_w_ih: np.ndarray
    enc_w_hh: np.ndarray
    enc_b: np.ndarray
    out_w: np.ndarray  # [3, H]
    out_b: np.ndarray  # [3]
    name: str = "DATEXIS-NER"
    ff_bn: tuple | None = None
    bilstm_bns: list | None = None  # one per BiLSTM layer, entries may be None
    enc_bn: tuple | None = None

    @property
    def input_dim(self) -> int:
        return self.ff_w.shape[1]

    def forward(self, x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """x [B, T, D_in] padded, lengths [B] → logits [B, T, 3].

        (The reference permutes to [B, 3, T] for CrossEntropyLoss,
        datexis_model.py:59-63 — a training concern; argmax is axis-final
        here either way.)
        """
        h = x @ self.ff_w.T + self.ff_b
        if self.ff_bn is not None:
            h = batchnorm_infer(h, self.ff_bn)
        h = np.maximum(h, 0.0)  # ReLU (after BN, datexis_model.py:134-138)
        for i, (fwd, bwd) in enumerate(self.bilstms):
            h = bilstm_forward(h, lengths, fwd, bwd)
            bn = self.bilstm_bns[i] if self.bilstm_bns else None
            if bn is not None:
                h = batchnorm_infer(h, bn)
        h = lstm_forward(h, self.enc_w_ih, self.enc_w_hh, self.enc_b)
        if self.enc_bn is not None:
            h = batchnorm_infer(h, self.enc_bn)
        return h @ self.out_w.T + self.out_b

    def predict_tags(self, x: np.ndarray, lengths: np.ndarray) -> list[list[str]]:
        """argmax over classes, truncated to true lengths, index→BIO2 with
        B=0, I=1, O=2 (reference bio2tag.py:12-18, annotator.py:274-281)."""
        logits = self.forward(x, lengths)
        idx = np.argmax(logits, axis=-1)
        tags = np.array(["B", "I", "O"])
        return [list(tags[idx[i, : lengths[i]]]) for i in range(len(lengths))]

    def predict_tags_scores(
        self, x: np.ndarray, lengths: np.ndarray
    ) -> tuple[list[list[str]], list[list[float]]]:
        """predict_tags + the winning logit per token rounded to 2 decimals —
        a numeric fingerprint of the whole forward pass (used by the golden
        neural oracle so the check verifies values, not just argmax)."""
        logits = self.forward(x, lengths)
        idx = np.argmax(logits, axis=-1)
        # widen to float64 BEFORE rounding so 0.04 is exactly the double
        # 0.04, not the widened float32 0.039999999…
        top = np.round(
            np.take_along_axis(logits, idx[..., None], axis=-1)[..., 0].astype(
                np.float64
            ),
            2,
        )
        tags = np.array(["B", "I", "O"])
        return (
            [list(tags[idx[i, : lengths[i]]]) for i in range(len(lengths))],
            [[float(v) for v in top[i, : lengths[i]]] for i in range(len(lengths))],
        )

    # ---- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        arrays = {
            "ff_w": self.ff_w,
            "ff_b": self.ff_b,
            "enc_w_ih": self.enc_w_ih,
            "enc_w_hh": self.enc_w_hh,
            "enc_b": self.enc_b,
            "out_w": self.out_w,
            "out_b": self.out_b,
            "n_bilstms": np.array(len(self.bilstms)),
            # unicode array, no pickle needed — without it load() would
            # silently relabel every architecture 'DATEXIS-NER'
            "name": np.array(self.name),
        }
        for i, (fwd, bwd) in enumerate(self.bilstms):
            for d, (w_ih, w_hh, b) in (("f", fwd), ("b", bwd)):
                arrays[f"l{i}{d}_w_ih"] = w_ih
                arrays[f"l{i}{d}_w_hh"] = w_hh
                arrays[f"l{i}{d}_b"] = b

        def _pack_bn(prefix: str, bn: tuple | None) -> None:
            if bn is not None:
                gamma, beta, mean, var, eps = bn
                arrays[f"{prefix}_bn"] = np.stack([gamma, beta, mean, var])
                arrays[f"{prefix}_bn_eps"] = np.array(eps)

        _pack_bn("ff", self.ff_bn)
        _pack_bn("enc", self.enc_bn)
        for i, bn in enumerate(self.bilstm_bns or []):
            _pack_bn(f"l{i}", bn)
        # write through a file handle: np.savez_compressed(str) silently
        # APPENDS .npz to an extension-less path, so save('/m/best') +
        # load('/m/best') — the same string — would FileNotFoundError;
        # the handle form writes to exactly the path given
        with open(path, "wb") as fh:
            np.savez_compressed(fh, **arrays)

    @classmethod
    def load(cls, path: str) -> "SequenceModel":
        z = np.load(path)
        n = int(z["n_bilstms"])
        bilstms = [
            (
                (z[f"l{i}f_w_ih"], z[f"l{i}f_w_hh"], z[f"l{i}f_b"]),
                (z[f"l{i}b_w_ih"], z[f"l{i}b_w_hh"], z[f"l{i}b_b"]),
            )
            for i in range(n)
        ]

        def _unpack_bn(prefix: str) -> tuple | None:
            key = f"{prefix}_bn"
            if key not in z:
                return None
            g, b, m, v = z[key]
            return (g, b, m, v, float(z[f"{key}_eps"]))

        bilstm_bns = [_unpack_bn(f"l{i}") for i in range(n)]
        return cls(
            ff_w=z["ff_w"], ff_b=z["ff_b"], bilstms=bilstms,
            enc_w_ih=z["enc_w_ih"], enc_w_hh=z["enc_w_hh"], enc_b=z["enc_b"],
            out_w=z["out_w"], out_b=z["out_b"],
            ff_bn=_unpack_bn("ff"), enc_bn=_unpack_bn("enc"),
            bilstm_bns=bilstm_bns if any(b is not None for b in bilstm_bns) else None,
            name=str(z["name"]) if "name" in z else "DATEXIS-NER",
        )


def _xavier(rng: np.random.Generator, shape: tuple[int, int]) -> np.ndarray:
    """xavier_normal (reference datexis_model.py:40-46: LSTM/Linear weights)."""
    std = np.sqrt(2.0 / (shape[0] + shape[1]))
    return rng.normal(0.0, std, size=shape).astype(np.float32)


def _lstm_params(rng: np.random.Generator, d_in: int, h: int):
    return (
        _xavier(rng, (4 * h, d_in)),
        _xavier(rng, (4 * h, h)),
        np.zeros(4 * h, dtype=np.float32),  # biases 0 (datexis_model.py:43-44)
    )


def _bn_params(rng: np.random.Generator, c: int, eps: float = 1e-5) -> tuple:
    """Seeded non-trivial BatchNorm running stats for fixture models —
    gamma/beta/mean drawn, var positive; a freshly-initialized torch BN
    would be (1, 0, 0, 1) (identity), which would hide placement bugs."""
    gamma = (1.0 + 0.1 * rng.normal(size=c)).astype(np.float32)
    beta = (0.1 * rng.normal(size=c)).astype(np.float32)
    mean = (0.2 * rng.normal(size=c)).astype(np.float32)
    var = (0.5 + rng.random(size=c)).astype(np.float32)
    return (gamma, beta, mean, var, eps)


def init_model(
    input_dim: int,
    feedforward_size: int = 150,
    lstm_size: int = 20,
    n_bilstm_layers: int = 1,
    out_features: int = 3,
    seed: int = 1632737901,  # reference training seed (main.py:89-92)
    name: str = "DATEXIS-NER",
    batch_norm: bool = False,
    bn_identity: bool = False,
) -> SequenceModel:
    """Seeded init mirroring the reference scheme: FF He-normal
    std=sqrt(2/fan_in) (datexis_model.py:48-50), LSTM/Linear xavier-normal,
    biases 0 (datexis_model.py:34-46). batch_norm=True builds the
    StackedBiLSTMModel BN set (datexis_model.py:105-109): FF-BN [F],
    one BN per BiLSTM [2H], encoder BN [H]. bn_identity=True uses torch's
    fresh-BatchNorm1d init (gamma=1, beta=0, running mean 0 / var 1) — the
    state a reference TRAINING run starts from; the default seeded
    non-trivial stats are for inference fixtures, where identity stats
    would hide placement bugs."""
    rng = np.random.default_rng(seed)
    ff_w = rng.normal(0.0, np.sqrt(2.0 / input_dim), size=(feedforward_size, input_dim)).astype(
        np.float32
    )
    ff_b = np.zeros(feedforward_size, dtype=np.float32)
    bilstms = []
    d = feedforward_size
    for _ in range(n_bilstm_layers):
        bilstms.append((_lstm_params(rng, d, lstm_size), _lstm_params(rng, d, lstm_size)))
        d = 2 * lstm_size
    enc = _lstm_params(rng, d, lstm_size)
    out_w = _xavier(rng, (out_features, lstm_size))
    out_b = np.zeros(out_features, dtype=np.float32)
    ff_bn = bilstm_bns = enc_bn = None
    if batch_norm:
        def _identity_bn(c, eps=1e-5):
            return (np.ones(c, dtype=np.float32), np.zeros(c, dtype=np.float32),
                    np.zeros(c, dtype=np.float32), np.ones(c, dtype=np.float32),
                    eps)

        mk = _identity_bn if bn_identity else (lambda c: _bn_params(rng, c))
        ff_bn = mk(feedforward_size)
        bilstm_bns = [mk(2 * lstm_size) for _ in range(n_bilstm_layers)]
        enc_bn = mk(lstm_size)
    return SequenceModel(
        ff_w=ff_w, ff_b=ff_b, bilstms=bilstms,
        enc_w_ih=enc[0], enc_w_hh=enc[1], enc_b=enc[2],
        out_w=out_w, out_b=out_b, name=name,
        ff_bn=ff_bn, bilstm_bns=bilstm_bns, enc_bn=enc_bn,
    )


# Model-name registry mirroring the reference factory
# (bioner/model/model_loader.py:64-115).
def load_model_config(name: str, input_dim: int, **overrides) -> SequenceModel:
    if name == "DATEXIS-NER":
        cfg = dict(feedforward_size=150, lstm_size=20, n_bilstm_layers=1)
    elif name == "CustomConfig_DATEXIS-NER":
        cfg = dict(feedforward_size=150, lstm_size=20, n_bilstm_layers=1)
    elif name == "CustomConfig_Stacked-DATEXIS-NER":
        # the stacked reference model supports BatchNorm1d between layers
        # (datexis_model.py:105-109); enabled here so BN-trained weights are
        # loadable/reproducible — BN with identity stats equals no-BN
        cfg = dict(feedforward_size=150, lstm_size=20, n_bilstm_layers=2,
                   batch_norm=True)
    elif name == "BioNER":
        cfg = dict(feedforward_size=2048, lstm_size=1024, n_bilstm_layers=3)
    else:
        raise ValueError(f"Unknown model name: {name}")  # model_loader.py:113-115
    cfg.update(overrides)
    return init_model(input_dim, name=name, **cfg)
