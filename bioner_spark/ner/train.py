"""Distributed training for the DATEXIS/BioNER sequence models (M9),
document-level shuffle (B2), and architecture grid search (A15).

Torch is absent from this environment, so the backward pass is implemented
in numpy against the engine's own golden-verified inference forward
(`ner/kernel.py`), and verified two independent ways:

  * finite-difference gradient checks on every layer (tests/test_train.py);
  * a distributed-vs-single-node differential: the Spark trainer and a
    single-process authority replay IDENTICAL batches (same doc-shuffle
    order, same per-sentence dropout masks, same Adam schedule) and must
    produce the same final weights to ~1e-9.

Reference semantics mirrored (cited per function):
  * loss: CrossEntropyLoss(ignore_index=-100), mean over non-pad tokens
    (reference bioner/model/annotator.py:23-24, 83, 94-106);
  * batching: documents shuffled once, flattened to sentences, consecutive
    batches of `batch_size` (conll_dataloader.py:7-13, collate_batch
    annotator.py:26-47);
  * optimizer: Adam, torch defaults betas=(0.9, 0.999), eps=1e-8, no weight
    decay (main.py:108, train_bioner.py:95);
  * per-epoch validation with entity-level micro P/R/F1, early stopping
    patience 10 on F1, best-by-val-F1 checkpoint kept
    (annotator.py:83-150, score_function :186-188);
  * grid search over lr x lstm_size x ff_size with the F1-drop early break
    (parameter_optimization.py:12-14, 94-131).

Spark-first rendering: synchronous data-parallel SGD. The encoded training
set is doc-shuffled into a deterministic global order (B2), round-robin
partitioned so every reference batch of 64 spans ALL shards, and each Adam
step is one Spark job: executors compute sum-gradients over their slice of
the batch with the numpy kernels, a treeAggregate adds them, the driver
applies the Adam update and rebroadcasts. Because CE-sum gradients are
additive over sentences, the aggregated update is mathematically identical
to the single-node step over the same batch — large-batch data parallelism,
the standard cluster rendering of a sequential SGD loop.

Scale notes: per step this scans each cached partition to select the batch
slice (O(n/P) per executor); at web scale you amortize it by raising the
global batch (fewer, fatter steps) — the math stays exact — or pre-split
steps into prunable partitions. Model weights ship per-step via broadcast
(torrent), grads return via treeAggregate(depth=2): for BioNER-sized
(~300 MB) models that is the same traffic pattern as a ring-allreduce round.
BatchNorm training mode is not implemented: none of the reference's own
training entry points enable it (parameter_optimization.py:100-105 passes
no batch_normalization flag), so only inference BN exists (kernel.py).
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field

import numpy as np

from .kernel import SequenceModel, _reverse_by_length, _sigmoid, init_model

IGNORE_INDEX = -100  # reference annotator.py:23-24
TAGS = np.array(["B", "I", "O"])


# --------------------------------------------------------------------------
# parameter <-> flat vector
# --------------------------------------------------------------------------
def param_names(model: SequenceModel) -> list[str]:
    names = ["ff_w", "ff_b"]
    for i in range(len(model.bilstms)):
        for d in ("f", "b"):
            names += [f"l{i}{d}_w_ih", f"l{i}{d}_w_hh", f"l{i}{d}_b"]
    names += ["enc_w_ih", "enc_w_hh", "enc_b", "out_w", "out_b"]
    return names


_LAYER_PARAM_RE = re.compile(r"^l(\d+)(f|b)_(w_ih|w_hh|b)$")


def get_param(model: SequenceModel, name: str) -> np.ndarray:
    # full regex parse, not name[1]/name[4:] slicing: a >=10-layer grid
    # emits 'l10f_w_ih', where single-char indexing misparses every field
    m = _LAYER_PARAM_RE.match(name)
    if m:
        fwd, bwd = model.bilstms[int(m.group(1))]
        trip = fwd if m.group(2) == "f" else bwd
        return {"w_ih": trip[0], "w_hh": trip[1], "b": trip[2]}[m.group(3)]
    return getattr(model, name)


def param_spec(model: SequenceModel) -> list[tuple[str, tuple]]:
    return [(n, get_param(model, n).shape) for n in param_names(model)]


def flatten_params(model: SequenceModel, dtype=None) -> np.ndarray:
    parts = [np.ravel(get_param(model, n)) for n in param_names(model)]
    flat = np.concatenate(parts)
    return flat.astype(dtype) if dtype is not None else flat


def flatten_grads(grads: dict, spec: list[tuple[str, tuple]]) -> np.ndarray:
    return np.concatenate([np.ravel(grads[n]) for n, _ in spec])


def model_from_flat(
    flat: np.ndarray, spec: list[tuple[str, tuple]], name: str = "DATEXIS-NER"
) -> SequenceModel:
    arrays, off = {}, 0
    for n, shape in spec:
        size = int(np.prod(shape))
        arrays[n] = flat[off : off + size].reshape(shape)
        off += size
    n_bilstms = sum(1 for n, _ in spec if n.endswith("f_w_ih"))
    bilstms = [
        (
            (arrays[f"l{i}f_w_ih"], arrays[f"l{i}f_w_hh"], arrays[f"l{i}f_b"]),
            (arrays[f"l{i}b_w_ih"], arrays[f"l{i}b_w_hh"], arrays[f"l{i}b_b"]),
        )
        for i in range(n_bilstms)
    ]
    return SequenceModel(
        ff_w=arrays["ff_w"], ff_b=arrays["ff_b"], bilstms=bilstms,
        enc_w_ih=arrays["enc_w_ih"], enc_w_hh=arrays["enc_w_hh"],
        enc_b=arrays["enc_b"], out_w=arrays["out_w"], out_b=arrays["out_b"],
        name=name,
    )


# --------------------------------------------------------------------------
# LSTM forward with cache + BPTT backward
# --------------------------------------------------------------------------
def lstm_forward_cache(x, w_ih, w_hh, b):
    """Same recurrence as kernel.lstm_forward, caching gates/cells for BPTT."""
    B, T, _ = x.shape
    H = w_hh.shape[1]
    h = np.zeros((B, H), dtype=x.dtype)
    c = np.zeros((B, H), dtype=x.dtype)
    I = np.empty((B, T, H), dtype=x.dtype)
    Fg = np.empty_like(I)
    G = np.empty_like(I)
    O = np.empty_like(I)
    C = np.empty_like(I)
    out = np.empty_like(I)
    xg = x @ w_ih.T + b
    for t in range(T):
        gates = xg[:, t, :] + h @ w_hh.T
        i = _sigmoid(gates[:, :H])
        f = _sigmoid(gates[:, H : 2 * H])
        g = np.tanh(gates[:, 2 * H : 3 * H])
        o = _sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        h = o * np.tanh(c)
        I[:, t], Fg[:, t], G[:, t], O[:, t], C[:, t], out[:, t] = i, f, g, o, c, h
    return out, (x, I, Fg, G, O, C, out, w_ih, w_hh)


def lstm_backward(cache, dout):
    """BPTT for one direction. dout [B,T,H] is the grad of the SUM loss
    w.r.t. the hidden outputs; returns (dx, dw_ih, dw_hh, db). Standard
    LSTM gradient equations; pad steps contribute exactly zero because the
    loss grad at pads is zero and the recurrence carries zeros backward."""
    x, I, Fg, G, O, C, out, w_ih, w_hh = cache
    B, T, D = x.shape
    H = w_hh.shape[1]
    dw_ih = np.zeros_like(w_ih)
    dw_hh = np.zeros_like(w_hh)
    db = np.zeros(4 * H, dtype=x.dtype)
    dx = np.empty_like(x)
    dh_next = np.zeros((B, H), dtype=x.dtype)
    dc_next = np.zeros((B, H), dtype=x.dtype)
    for t in range(T - 1, -1, -1):
        dh = dout[:, t] + dh_next
        i, f, g, o, c = I[:, t], Fg[:, t], G[:, t], O[:, t], C[:, t]
        tc = np.tanh(c)
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        c_prev = C[:, t - 1] if t > 0 else np.zeros_like(c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_next = dc * f
        da = np.concatenate(
            [di * i * (1 - i), df * f * (1 - f), dg * (1 - g * g), do * o * (1 - o)],
            axis=1,
        )  # [B, 4H], gate order i,f,g,o (kernel.py:22-23)
        h_prev = out[:, t - 1] if t > 0 else np.zeros((B, H), dtype=x.dtype)
        dw_ih += da.T @ x[:, t]
        dw_hh += da.T @ h_prev
        db += da.sum(axis=0)
        dx[:, t] = da @ w_ih
        dh_next = da @ w_hh
    return dx, dw_ih, dw_hh, db


def bilstm_forward_cache(x, lengths, fwd, bwd):
    out_f, cache_f = lstm_forward_cache(x, *fwd)
    rev = _reverse_by_length(x, lengths)
    out_b_rev, cache_b = lstm_forward_cache(rev, *bwd)
    out_b = _reverse_by_length(out_b_rev, lengths)
    return np.concatenate([out_f, out_b], axis=-1), (cache_f, cache_b)


def bilstm_backward(caches, lengths, dout, grads, prefix):
    """Grad of the length-aware reversal is the reversal itself (it is a
    per-sequence involution), so the backward direction back-propagates on
    the reversed stream."""
    cache_f, cache_b = caches
    H = dout.shape[-1] // 2
    dx_f, dwi_f, dwh_f, db_f = lstm_backward(cache_f, dout[..., :H])
    dout_b_rev = _reverse_by_length(np.ascontiguousarray(dout[..., H:]), lengths)
    dx_rev, dwi_b, dwh_b, db_b = lstm_backward(cache_b, dout_b_rev)
    dx_b = _reverse_by_length(dx_rev, lengths)
    grads[f"{prefix}f_w_ih"], grads[f"{prefix}f_w_hh"], grads[f"{prefix}f_b"] = (
        dwi_f, dwh_f, db_f,
    )
    grads[f"{prefix}b_w_ih"], grads[f"{prefix}b_w_hh"], grads[f"{prefix}b_b"] = (
        dwi_b, dwh_b, db_b,
    )
    return dx_f + dx_b


# --------------------------------------------------------------------------
# full model: training forward (cached) + backward
# --------------------------------------------------------------------------
def forward_train(model: SequenceModel, x, lengths, masks=None):
    """Training-mode forward (dropout via explicit masks, inverted scaling
    already baked into the masks). masks = None (eval) or
    [mask_ff [B,T,F], mask_bilstm_0 [B,T,2H], ...] — dropout after FF-ReLU
    and after every BiLSTM, never after the encoder LSTM, mirroring
    StackedBiLSTMModel.forward (datexis_model.py:132-156)."""
    if model.ff_bn is not None or model.enc_bn is not None or model.bilstm_bns:
        raise NotImplementedError(
            "BatchNorm training mode is out of scope: no reference training "
            "entry point enables it (parameter_optimization.py:100-105); "
            "inference-mode BN lives in kernel.batchnorm_infer"
        )
    h0 = x @ model.ff_w.T + model.ff_b
    relu_mask = (h0 > 0).astype(x.dtype)
    h = h0 * relu_mask
    if masks is not None:
        h = h * masks[0]
    layer_caches = []
    for li, (fwd, bwd) in enumerate(model.bilstms):
        out, caches = bilstm_forward_cache(h, lengths, fwd, bwd)
        m = masks[1 + li] if masks is not None else None
        layer_caches.append((caches, m))
        h = out * m if m is not None else out
    enc_out, enc_cache = lstm_forward_cache(h, model.enc_w_ih, model.enc_w_hh, model.enc_b)
    logits = enc_out @ model.out_w.T + model.out_b
    cache = {
        "x": x, "relu_mask": relu_mask,
        "mask0": masks[0] if masks is not None else None,
        "layers": layer_caches, "enc": enc_cache, "enc_out": enc_out,
        "lengths": lengths,
    }
    return logits, cache


def backward_model(model: SequenceModel, cache, dlogits) -> dict:
    grads: dict[str, np.ndarray] = {}
    grads["out_w"] = np.einsum("btc,bth->ch", dlogits, cache["enc_out"])
    grads["out_b"] = dlogits.sum(axis=(0, 1))
    dh = dlogits @ model.out_w
    dh, grads["enc_w_ih"], grads["enc_w_hh"], grads["enc_b"] = lstm_backward(
        cache["enc"], dh
    )
    for li in range(len(model.bilstms) - 1, -1, -1):
        caches, m = cache["layers"][li]
        if m is not None:
            dh = dh * m
        dh = bilstm_backward(caches, cache["lengths"], dh, grads, prefix=f"l{li}")
    if cache["mask0"] is not None:
        dh = dh * cache["mask0"]
    dh = dh * cache["relu_mask"]
    grads["ff_w"] = np.einsum("btf,btd->fd", dh, cache["x"])
    grads["ff_b"] = dh.sum(axis=(0, 1))
    return grads


def cross_entropy_sum(logits, y, ignore_index: int = IGNORE_INDEX):
    """Softmax cross entropy. Returns (loss_SUM over valid tokens, n_valid,
    dlogits of the SUM) — mean-reduction (reference CrossEntropyLoss
    default) is applied by the caller as sum/n_valid AFTER cross-partition
    aggregation, which makes the distributed gradient exactly the
    single-node mean gradient."""
    valid = y != ignore_index
    z = logits - logits.max(axis=-1, keepdims=True)
    logsum = np.log(np.exp(z).sum(axis=-1, keepdims=True))
    logp = z - logsum
    yy = np.where(valid, y, 0)
    picked = np.take_along_axis(logp, yy[..., None], axis=-1)[..., 0]
    loss = -(picked * valid).sum()
    dlogits = np.exp(logp)
    onehot = np.zeros_like(dlogits)
    np.put_along_axis(onehot, yy[..., None], 1.0, axis=-1)
    dlogits = (dlogits - onehot) * valid[..., None]
    return float(loss), int(valid.sum()), dlogits


# --------------------------------------------------------------------------
# Adam (torch semantics: betas (0.9, 0.999), eps 1e-8, no weight decay —
# the reference always constructs optim.Adam(model.parameters(), lr=...)
# with defaults otherwise, main.py:108)
# --------------------------------------------------------------------------
@dataclass
class AdamState:
    m: np.ndarray
    v: np.ndarray
    t: int = 0
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8

    @classmethod
    def like(cls, flat: np.ndarray) -> "AdamState":
        return cls(m=np.zeros_like(flat), v=np.zeros_like(flat))

    def step(self, flat: np.ndarray, grad: np.ndarray, lr: float) -> np.ndarray:
        self.t += 1
        self.m = self.beta1 * self.m + (1.0 - self.beta1) * grad
        self.v = self.beta2 * self.v + (1.0 - self.beta2) * grad * grad
        mhat = self.m / (1.0 - self.beta1**self.t)
        vhat = self.v / (1.0 - self.beta2**self.t)
        return flat - lr * mhat / (np.sqrt(vhat) + self.eps)


# --------------------------------------------------------------------------
# deterministic per-sentence dropout masks
# --------------------------------------------------------------------------
def dropout_masks_for_sentence(
    p: float, length: int, dims: list[int], seed: int, step: int, order_idx: int, dtype
):
    """Inverted-dropout masks for ONE sentence, one per dropout site, drawn
    over the TRUE length only — so the draw is identical no matter how the
    sentence is padded or which partition computes it (the key to
    distributed/single-node parity under dropout)."""
    out = []
    for layer, d in enumerate(dims):
        rng = np.random.default_rng([seed, step, order_idx, layer])
        keep = (rng.random((length, d)) >= p).astype(dtype) / (1.0 - p)
        out.append(keep)
    return out


def _pad_batch(rows, input_dim, dtype, dropout_p, mask_dims, seed, step):
    """rows: list of (order_idx, x [L,D] list-like, y [L] list-like) →
    padded arrays + per-sentence masks assembled into batch masks."""
    B = len(rows)
    lengths = np.array([len(r[2]) for r in rows], dtype=np.int64)
    T = int(lengths.max())
    x = np.zeros((B, T, input_dim), dtype=dtype)
    y = np.full((B, T), IGNORE_INDEX, dtype=np.int64)
    masks = None
    if dropout_p > 0:
        masks = [np.ones((B, T, d), dtype=dtype) for d in mask_dims]
    for bi, (oi, xs, ys) in enumerate(rows):
        L = len(ys)
        x[bi, :L] = np.asarray(xs, dtype=dtype)
        y[bi, :L] = np.asarray(ys, dtype=np.int64)
        if dropout_p > 0:
            ms = dropout_masks_for_sentence(
                dropout_p, L, mask_dims, seed, step, int(oi), dtype
            )
            for site, m in enumerate(ms):
                masks[site][bi, :L] = m
    return x, y, lengths, masks


def _mask_dims(model: SequenceModel) -> list[int]:
    ff = model.ff_w.shape[0]
    return [ff] + [2 * f[1].shape[1] for f, _ in model.bilstms]


def batch_gradient(model, spec, rows, *, dropout_p, seed, step, dtype):
    """Sum-CE gradient over `rows` (any subset of a global batch).
    Additive across subsets: sum over shards == the full-batch gradient."""
    if not rows:
        size = sum(int(np.prod(s)) for _, s in spec)
        return np.zeros(size, dtype=dtype), 0.0, 0
    x, y, lengths, masks = _pad_batch(
        rows, model.input_dim, dtype, dropout_p, _mask_dims(model), seed, step
    )
    logits, cache = forward_train(model, x, lengths, masks)
    loss, n_valid, dlogits = cross_entropy_sum(logits, y)
    grads = backward_model(model, cache, dlogits)
    return flatten_grads(grads, spec), loss, n_valid


# --------------------------------------------------------------------------
# entity-level micro P/R/F1 (evaluation metric, annotator.py:92-106)
# --------------------------------------------------------------------------
def prf_counts(pred_tag_lists, gold_tag_lists) -> tuple[int, int, int]:
    from ..spans import decode_spans_reference

    pred = set(decode_spans_reference(pred_tag_lists))
    gold = set(decode_spans_reference(gold_tag_lists))
    tp = len(pred & gold)
    return tp, len(pred) - tp, len(gold) - tp


def _eval_rows(model: SequenceModel, rows, dtype) -> tuple[int, int, int]:
    """Entity-level tp/fp/fn over (x, y) rows using the golden-verified
    INFERENCE forward (kernel.SequenceModel.forward — dropout off)."""
    if not rows:
        return 0, 0, 0
    lengths = np.array([len(r[1]) for r in rows], dtype=np.int64)
    T = int(lengths.max())
    x = np.zeros((len(rows), T, model.input_dim), dtype=dtype)
    gold_tags = []
    for bi, (xs, ys) in enumerate(rows):
        L = len(ys)
        x[bi, :L] = np.asarray(xs, dtype=dtype)
        gold_tags.append([str(TAGS[t]) for t in ys])
    pred_tags = model.predict_tags(x, lengths)
    return prf_counts(pred_tags, gold_tags)


def _prf1(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


# --------------------------------------------------------------------------
# results container
# --------------------------------------------------------------------------
@dataclass
class TrainResult:
    flat: np.ndarray  # best weights (by val F1)
    spec: list
    history: list = field(default_factory=list)  # per-epoch dicts
    best_val_f1: float = 0.0
    best_epoch: int = 0
    stopped_epoch: int = 0

    def model(self, name: str = "DATEXIS-NER") -> SequenceModel:
        return model_from_flat(self.flat, self.spec, name=name)


def _early_stop_loop(epoch_fn, eval_fn, flat0, spec, max_epochs, patience, save_path):
    """Shared driver loop: per-epoch train + val F1, ignite-style early
    stopping (counter resets only on strict improvement, annotator via
    ignite EarlyStopping patience=10) and best-checkpoint (n_saved=1,
    annotator.py:140-150)."""
    import time

    flat = flat0
    best_f1, best_flat, best_epoch, stall = -1.0, flat0, 0, 0
    history = []
    stopped = 0
    for epoch in range(1, max_epochs + 1):
        t0 = time.perf_counter()
        flat, mean_loss = epoch_fn(flat, epoch)
        epoch_sec = time.perf_counter() - t0
        p, r, f1 = eval_fn(flat)
        history.append(
            {"epoch": epoch, "train_loss": mean_loss, "val_precision": p,
             "val_recall": r, "val_f1": f1, "epoch_sec": epoch_sec}
        )
        if f1 > best_f1:
            best_f1, best_flat, best_epoch, stall = f1, flat.copy(), epoch, 0
        else:
            stall += 1
        stopped = epoch
        if stall >= patience:
            break
    res = TrainResult(
        flat=best_flat, spec=spec, history=history,
        best_val_f1=max(best_f1, 0.0), best_epoch=best_epoch, stopped_epoch=stopped,
    )
    if save_path:
        res.model().save(save_path)
    return res


# --------------------------------------------------------------------------
# single-node authority (differential twin of the Spark trainer)
# --------------------------------------------------------------------------
def train_single_node(
    train_rows,  # list of (order_idx, x, y) — already doc-shuffle-ordered
    val_rows,  # list of (x, y)
    model: SequenceModel,
    *,
    batch_size: int = 64,
    max_epochs: int = 10,
    lr: float = 0.0005,
    dropout_p: float = 0.0,
    seed: int = 1632737901,
    patience: int = 10,
    model_save_path: str | None = None,
    dtype=np.float32,
) -> TrainResult:
    spec = param_spec(model)
    flat0 = flatten_params(model, dtype)
    adam = AdamState.like(flat0)
    ordered = sorted(train_rows, key=lambda r: r[0])
    n_steps = math.ceil(len(ordered) / batch_size)

    def epoch_fn(flat, epoch):
        losses = []
        for k in range(n_steps):
            m = model_from_flat(flat, spec)
            step = (epoch - 1) * n_steps + k
            rows = ordered[k * batch_size : (k + 1) * batch_size]
            grad, loss, n_valid = batch_gradient(
                m, spec, rows, dropout_p=dropout_p, seed=seed, step=step, dtype=dtype
            )
            flat = adam.step(flat, grad / max(n_valid, 1), lr)
            losses.append(loss / max(n_valid, 1))
        return flat, float(np.mean(losses))

    def eval_fn(flat):
        m = model_from_flat(flat, spec)
        return _prf1(*_eval_rows(m, val_rows, dtype))

    return _early_stop_loop(
        epoch_fn, eval_fn, flat0, spec, max_epochs, patience, model_save_path
    )


# --------------------------------------------------------------------------
# B2: deterministic document-level shuffle → global sentence order
# --------------------------------------------------------------------------
def assign_doc_shuffled_order(df, seed: int, order_partitions: int | None = None):
    """Doc-level shuffle (reference CoNLLDataLoader: random.shuffle of
    dataset.documents then flatten, conll_dataloader.py:10-12) as a
    deterministic distributed op: documents ordered by xxhash64(seed,
    doc_id) — a seeded permutation — sentences stay contiguous per doc.

    Returns (DataFrame with order_idx, n_sentences). The global index is
    the two-phase distributed rank (range-partition by the shuffle key →
    partitioned window → driver offset add; same pattern as
    functions/ngrams.build_vocabulary — no single-partition window), then
    order_idx = doc's sentence-count prefix sum + rank within doc.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if order_partitions is None:
        order_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    doc_counts = (
        df.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_sent"))
        .withColumn("_shuf", F.xxhash64(F.lit(seed), F.col("doc_id")))
    )
    sort_key = [F.asc("_shuf"), F.asc("doc_id")]
    ranged = (
        doc_counts.repartitionByRange(order_partitions, *sort_key)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # per-partition totals of SENTENCES (not docs): the doc prefix offsets
    totals = ranged.groupBy("_pid").agg(
        F.sum("_n_sent").alias("sz"), F.count(F.lit(1)).alias("docs")
    ).collect()
    sizes = {r["_pid"]: r["sz"] for r in totals}
    n_docs = sum(r["docs"] for r in totals)
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    n_sentences = acc
    offset_expr = (
        F.element_at(
            F.create_map(*[F.lit(v) for kv in sorted(offsets.items()) for v in kv]),
            F.col("_pid"),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy(*sort_key)
    doc_offsets = ranged.withColumn(
        "_doc_off",
        offset_expr + F.sum("_n_sent").over(w) - F.col("_n_sent"),
    ).select("doc_id", "_doc_off")
    # cut the lineage to `ranged` (one small one-row-per-doc
    # materialization) and release its cache NOW — otherwise the persisted
    # counts table stays pinned in executor memory for the whole training
    # run (one leaked cache entry per grid_search trial).
    # localCheckpoint DELIBERATELY, not persist: repartitionByRange picks
    # boundaries by sampling, so a lineage recompute (cache eviction /
    # executor loss) could re-sample different _pid assignments while the
    # collected `offsets` map still encodes the old ones — silently wrong
    # order_idx. A checkpoint block lost to executor death fails LOUDLY
    # instead; fault-tolerant clusters should use a reliable checkpoint
    # dir (sc.setCheckpointDir + .checkpoint()) for multi-hour runs.
    doc_offsets = doc_offsets.localCheckpoint(eager=True)
    ranged.unpersist()
    sent_w = Window.partitionBy("doc_id").orderBy("sentence_id")
    out = (
        # the offsets table is one row per doc — broadcast while it is
        # dimension-table-sized, shuffle-join beyond that
        df.join(F.broadcast(doc_offsets) if n_docs <= 2_000_000 else doc_offsets, "doc_id")
        .withColumn("order_idx", F.col("_doc_off") + F.row_number().over(sent_w) - 1)
        .drop("_doc_off")
    )
    return out, int(n_sentences)


# --------------------------------------------------------------------------
# M9: the distributed trainer
# --------------------------------------------------------------------------
def train_distributed(
    spark,
    train_df,  # columns: doc_id long, sentence_id, x array<array<float/double>>, y array<int>
    val_df,  # columns: x, y
    model: SequenceModel,
    *,
    batch_size: int = 64,
    max_epochs: int = 10,
    lr: float = 0.0005,
    dropout_p: float = 0.0,
    seed: int = 1632737901,
    patience: int = 10,
    n_shards: int | None = None,
    model_save_path: str | None = None,
    dtype=np.float32,
) -> TrainResult:
    """Synchronous data-parallel training. Every global batch is the SAME
    batch the reference's sequential loop would form (doc-shuffled order,
    consecutive slices of `batch_size`), split across `n_shards` partitions
    by order_idx % n_shards; each Adam step aggregates the shards'
    sum-gradients (treeAggregate) and updates on the driver. Differentially
    tested against train_single_node to ~1e-9 (tests/test_train.py)."""
    sc = spark.sparkContext
    if n_shards is None:
        n_shards = max(2, sc.defaultParallelism // 4)
    ordered, n_train = assign_doc_shuffled_order(train_df, seed)
    train_rdd = (
        ordered.select("order_idx", "x", "y")
        .rdd.map(lambda r: (int(r[0]), (int(r[0]), r[1], r[2])))
        .partitionBy(n_shards, lambda k: k % n_shards)
        .values()
        .cache()
    )
    val_rdd = val_df.select("x", "y").rdd.map(lambda r: (r[0], r[1])).cache()
    train_rdd.count()  # materialize once before the timed loop

    spec = param_spec(model)
    flat0 = flatten_params(model, dtype)
    adam = AdamState.like(flat0)
    n_steps = math.ceil(n_train / batch_size)
    zero = (np.zeros_like(flat0), 0.0, 0)

    def epoch_fn(flat, epoch):
        losses = []
        for k in range(n_steps):
            step = (epoch - 1) * n_steps + k
            lo, hi = k * batch_size, (k + 1) * batch_size
            bw = sc.broadcast(flat)

            def shard_grad(it, lo=lo, hi=hi, step=step):
                m = model_from_flat(bw.value, spec)
                rows = [r for r in it if lo <= r[0] < hi]
                yield batch_gradient(
                    m, spec, rows, dropout_p=dropout_p, seed=seed, step=step,
                    dtype=dtype,
                )

            grad, loss, n_valid = train_rdd.mapPartitions(shard_grad).treeAggregate(
                zero,
                lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                depth=2,
            )
            bw.unpersist()
            flat = adam.step(flat, grad / max(n_valid, 1), lr)
            losses.append(loss / max(n_valid, 1))
        return flat, float(np.mean(losses))

    def eval_fn(flat):
        bw = sc.broadcast(flat)

        def shard_eval(it):
            # chunk the partition: one dense pad batch per batch_size rows
            # (a whole-partition batch is O(n_rows x max_len x input_dim)
            # memory — one 256-token outlier in a 100k-sentence shard would
            # allocate tens of GB; chunking bounds it like the train path)
            m = model_from_flat(bw.value, spec)
            tp = fp = fn = 0
            chunk: list = []
            for r in it:
                chunk.append(r)
                if len(chunk) >= batch_size:
                    a, b, c = _eval_rows(m, chunk, dtype)
                    tp, fp, fn = tp + a, fp + b, fn + c
                    chunk = []
            a, b, c = _eval_rows(m, chunk, dtype)
            yield tp + a, fp + b, fn + c

        tp, fp, fn = val_rdd.mapPartitions(shard_eval).treeAggregate(
            (0, 0, 0),
            lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
            lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
            depth=2,
        )
        bw.unpersist()
        return _prf1(tp, fp, fn)

    try:
        return _early_stop_loop(
            epoch_fn, eval_fn, flat0, spec, max_epochs, patience, model_save_path
        )
    finally:
        train_rdd.unpersist()
        val_rdd.unpersist()


# --------------------------------------------------------------------------
# encoded training frame from tagged tokens (the reference's
# Annotator.load_dataset = CoNLLDataset + FasttextEncoder.encode,
# annotator.py:190-196 — BioNER trains on fastText vectors ONLY,
# fasttext_encoder.py:17-28)
# --------------------------------------------------------------------------
def training_frame_fasttext(tokens, ft_model, tag_col: str = "tag"):
    """tokens (doc_id, sentence_id, token_id, text, tag) → one row per
    sentence: (doc_id, sentence_id, x: array<array<float>>, y: array<int>)
    ready for train_distributed. Labels: B=0, I=1, O=2 (bio2tag.py:12-18,
    matching kernel.predict_tags). One shuffle (the sentence groupBy);
    the fastText lookup is the vectorized distinct-word path of
    fasttext_token_vectors."""
    from pyspark.sql import functions as F

    from .fasttext import fasttext_token_vectors

    enc = fasttext_token_vectors(tokens, ft_model, out_col="_ft_vec")
    tag_idx = (
        F.when(F.col(tag_col) == "B", 0)
        .when(F.col(tag_col) == "I", 1)
        .otherwise(2)
        .cast("int")
    )
    return (
        enc.select(
            "doc_id", "sentence_id", "token_id",
            F.col("_ft_vec").alias("_x"), tag_idx.alias("_y"),
        )
        .groupBy("doc_id", "sentence_id")
        .agg(F.array_sort(F.collect_list(F.struct("token_id", "_x", "_y"))).alias("_t"))
        .select(
            "doc_id", "sentence_id",
            F.transform("_t", lambda s: s["_x"]).alias("x"),
            F.transform("_t", lambda s: s["_y"]).alias("y"),
        )
    )


# --------------------------------------------------------------------------
# A15: architecture grid search (parameter_optimization.py:12-14, 94-131)
# --------------------------------------------------------------------------
def grid_search(
    train_fn,  # (lr, lstm_size, ff_size) -> TrainResult-like with .best_val_f1
    learning_rates=(0.005, 0.0005),
    lstm_sizes=(20, 256, 512, 1024, 2048, 4096),
    ff_sizes=(150, 256, 512, 1024, 2048, 4096),
):
    """The reference's sweep rule, exactly: for each (lr, lstm) the ff loop
    carries last_f1 starting at 0.0 and BREAKS as soon as a result scores
    below it (parameter_optimization.py:96, 128-131). Each train_fn call is
    itself a distributed Spark job (train_distributed), so the sweep
    parallelism axis is within-run; runs are sequential like the reference."""
    results = []
    for lr in learning_rates:
        for lstm in lstm_sizes:
            last_f1 = 0.0
            for ff in ff_sizes:
                res = train_fn(lr, lstm, ff)
                results.append(
                    {"lr": lr, "lstm_size": lstm, "ff_size": ff,
                     "val_f1": res.best_val_f1, "result": res}
                )
                if res.best_val_f1 < last_f1:
                    break
                last_f1 = res.best_val_f1
    best = max(results, key=lambda r: r["val_f1"]) if results else None
    return results, best
