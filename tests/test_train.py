"""Training-stack verification (M9/B2/A15):

1. forward_train (cached training forward) must equal the golden-verified
   inference forward bit-for-bit when dropout is off;
2. finite-difference gradient checks on EVERY parameter tensor, with padded
   batches, ignore_index labels, and dropout masks;
3. Adam vs a hand-stepped scalar reference (torch-default semantics);
4. the distributed trainer and the single-node authority replay identical
   batches and must agree on final weights to ~1e-9 (float64);
5. early stopping + best-checkpoint semantics;
6. B2 doc-shuffle order: deterministic, doc-contiguous, seed-sensitive;
7. A15 grid search early-break rule parity (parameter_optimization.py:128-131).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from bioner_spark.ner.kernel import init_model
from bioner_spark.ner.train import (
    AdamState,
    TrainResult,
    assign_doc_shuffled_order,
    backward_model,
    batch_gradient,
    cross_entropy_sum,
    dropout_masks_for_sentence,
    flatten_grads,
    flatten_params,
    forward_train,
    grid_search,
    model_from_flat,
    param_spec,
    train_distributed,
    train_single_node,
)

RNG = np.random.default_rng(20260817)


def tiny_model(dtype=np.float64, **over):
    cfg = dict(feedforward_size=7, lstm_size=4, n_bilstm_layers=2, seed=7)
    cfg.update(over)
    m = init_model(input_dim=5, **cfg)
    # float32 init → requested dtype for numerically tight tests
    flat = flatten_params(m, dtype)
    return model_from_flat(flat, param_spec(m))


def random_batch(B=3, Tmax=6, D=5, dtype=np.float64, seed=1):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(2, Tmax + 1, size=B)
    lengths[0] = Tmax  # at least one full-length row
    x = rng.normal(size=(B, Tmax, D)).astype(dtype)
    y = rng.integers(0, 3, size=(B, Tmax))
    for i, L in enumerate(lengths):
        x[i, L:] = 0.0
        y[i, L:] = -100
    return x, y, lengths


def test_forward_train_matches_inference_forward():
    m = tiny_model()
    x, _, lengths = random_batch()
    logits, _ = forward_train(m, x, lengths, masks=None)
    ref = m.forward(x, lengths)
    np.testing.assert_array_equal(logits, ref)


def _loss_for(m, x, y, lengths, masks):
    logits, _ = forward_train(m, x, lengths, masks)
    loss, n, _ = cross_entropy_sum(logits, y)
    return loss


@pytest.mark.parametrize("dropout", [None, 0.4])
def test_gradcheck_every_parameter(dropout):
    m = tiny_model()
    spec = param_spec(m)
    x, y, lengths = random_batch()
    masks = None
    if dropout:
        from bioner_spark.ner.train import _mask_dims

        dims = _mask_dims(m)
        masks = [np.ones((x.shape[0], x.shape[1], d)) for d in dims]
        for bi, L in enumerate(lengths):
            ms = dropout_masks_for_sentence(dropout, int(L), dims, 9, 0, bi, np.float64)
            for site, mk in enumerate(ms):
                masks[site][bi, :L] = mk

    logits, cache = forward_train(m, x, lengths, masks)
    _, _, dlogits = cross_entropy_sum(logits, y)
    grads = backward_model(m, cache, dlogits)
    flat = flatten_params(m)
    flat_grad = flatten_grads(grads, spec)

    eps = 1e-6
    rng = np.random.default_rng(3)
    # probe a sample of coordinates in every tensor
    off = 0
    for name, shape in spec:
        size = int(np.prod(shape))
        for idx in rng.choice(size, size=min(4, size), replace=False):
            j = off + int(idx)
            fp = flat.copy()
            fp[j] += eps
            lp = _loss_for(model_from_flat(fp, spec), x, y, lengths, masks)
            fm = flat.copy()
            fm[j] -= eps
            lm = _loss_for(model_from_flat(fm, spec), x, y, lengths, masks)
            num = (lp - lm) / (2 * eps)
            ana = flat_grad[j]
            assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (
                f"{name}[{idx}]: numeric {num} vs analytic {ana}"
            )
        off += size


def test_gradient_zero_wrt_pad_inputs():
    """Packed-sequence parity: the loss must not depend on pad-position
    inputs at all (kernel docstring invariant, datexis_model.py:55-58)."""
    m = tiny_model()
    x, y, lengths = random_batch()
    base = _loss_for(m, x, y, lengths, None)
    x2 = x.copy()
    for i, L in enumerate(lengths):
        x2[i, L:] = 123.456
    assert _loss_for(m, x2, y, lengths, None) == pytest.approx(base, abs=1e-12)


def test_adam_matches_hand_reference():
    """Two steps on a 2-vector against the torch-documented update rule."""
    flat = np.array([1.0, -2.0])
    st = AdamState.like(flat)
    g1 = np.array([0.5, -1.5])
    g2 = np.array([-0.25, 0.75])
    lr = 0.1
    m = v = np.zeros(2)
    ref = flat.copy()
    for t, g in ((1, g1), (2, g2)):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        ref = ref - lr * (m / (1 - 0.9**t)) / (np.sqrt(v / (1 - 0.999**t)) + 1e-8)
    out = st.step(flat, g1, lr)
    out = st.step(out, g2, lr)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-15)


def _toy_rows(n_docs=6, max_sent=3, D=5, seed=11):
    """Deterministic learnable corpus: label depends on feature sign."""
    rng = np.random.default_rng(seed)
    rows = []
    order = 0
    for d in range(n_docs):
        for s in range(int(rng.integers(1, max_sent + 1))):
            L = int(rng.integers(2, 7))
            x = rng.normal(size=(L, D))
            y = (x[:, 0] > 0.3).astype(int)  # mostly O(2)/B-ish mix
            y = np.where(y == 1, 0, 2)
            rows.append((order, x.tolist(), y.tolist(), d, s))
            order += 1
    return rows


def test_distributed_matches_single_node(spark):
    rows = _toy_rows()
    train_rows = [(o, x, y) for (o, x, y, d, s) in rows]
    val_rows = [(x, y) for (o, x, y, d, s) in rows[:5]]
    m = tiny_model(n_bilstm_layers=1)

    single = train_single_node(
        train_rows, val_rows, m, batch_size=6, max_epochs=3, lr=0.01,
        dropout_p=0.3, seed=42, dtype=np.float64,
    )

    # Spark path must derive the SAME order: build a df whose doc shuffle
    # with seed=42 reproduces train_rows' order — instead of fighting the
    # hash permutation, feed the single-node authority the ORDER THE SPARK
    # SIDE PRODUCES. So: run the order assignment first, read it back, and
    # hand that ordering to the authority.
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sentence_id", IntegerType()),
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    df = spark.createDataFrame(
        [(d, s, x, y) for (o, x, y, d, s) in rows], schema
    )
    ordered, n = assign_doc_shuffled_order(df, seed=42)
    assert n == len(rows)
    collected = ordered.select("order_idx", "x", "y").collect()
    auth_rows = [(int(r[0]), r[1], r[2]) for r in collected]
    single2 = train_single_node(
        auth_rows, val_rows, m, batch_size=6, max_epochs=3, lr=0.01,
        dropout_p=0.3, seed=42, dtype=np.float64,
    )

    val_schema = StructType(
        [
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    val_df = spark.createDataFrame(val_rows, val_schema)
    dist = train_distributed(
        spark, df, val_df, m, batch_size=6, max_epochs=3, lr=0.01,
        dropout_p=0.3, seed=42, n_shards=3, dtype=np.float64,
    )

    np.testing.assert_allclose(dist.flat, single2.flat, rtol=0, atol=1e-9)
    for h1, h2 in zip(dist.history, single2.history):
        assert h1["train_loss"] == pytest.approx(h2["train_loss"], abs=1e-9)
        assert h1["val_f1"] == pytest.approx(h2["val_f1"], abs=1e-12)
    # sanity: the sorted single-node run (order_idx already 0..n-1 in input
    # order) differs from the shuffled one unless the hash permutation is
    # the identity — not asserted, just exercised above via `single`.
    assert single.stopped_epoch == 3


def test_training_learns_and_early_stops(spark):
    rows = _toy_rows(n_docs=10, seed=5)
    train_rows = [(o, x, y) for (o, x, y, d, s) in rows]
    val_rows = [(x, y) for (o, x, y, d, s) in rows]
    m = tiny_model(n_bilstm_layers=1)
    res = train_single_node(
        train_rows, val_rows, m, batch_size=8, max_epochs=12, lr=0.02,
        seed=3, patience=3, dtype=np.float64,
    )
    losses = [h["train_loss"] for h in res.history]
    assert losses[-1] < losses[0] * 0.9  # it learns
    # best checkpoint = argmax val F1 among run epochs
    f1s = [h["val_f1"] for h in res.history]
    assert res.best_val_f1 == pytest.approx(max(f1s))
    assert res.history[res.best_epoch - 1]["val_f1"] == pytest.approx(res.best_val_f1)
    # patience: run ends no later than best_epoch + patience
    assert res.stopped_epoch <= res.best_epoch + 3


def test_doc_shuffle_contiguous_and_seeded(spark):
    rows = _toy_rows(n_docs=8, seed=2)
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sentence_id", IntegerType()),
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    df = spark.createDataFrame([(d, s, x, y) for (o, x, y, d, s) in rows], schema)
    o1, n1 = assign_doc_shuffled_order(df, seed=1)
    o1b, _ = assign_doc_shuffled_order(df, seed=1)
    o2, _ = assign_doc_shuffled_order(df, seed=2)
    a = [(r["order_idx"], r["doc_id"], r["sentence_id"]) for r in o1.collect()]
    b = [(r["order_idx"], r["doc_id"], r["sentence_id"]) for r in o1b.collect()]
    c = [(r["order_idx"], r["doc_id"], r["sentence_id"]) for r in o2.collect()]
    assert sorted(a) == sorted(b)  # deterministic
    assert sorted(x[0] for x in a) == list(range(n1))  # a permutation
    assert sorted(a) != sorted(c)  # seed-sensitive
    # doc-contiguity: per doc, order idxs form one consecutive run ordered
    # by sentence_id (conll_dataloader.py:10-12 flatten semantics)
    by_doc: dict = {}
    for oi, d, s in a:
        by_doc.setdefault(d, []).append((s, oi))
    for d, lst in by_doc.items():
        lst.sort()
        ois = [oi for _, oi in lst]
        assert ois == list(range(min(ois), min(ois) + len(ois)))


def test_grid_search_early_break_rule():
    """Scripted F1 sequence: within one (lr, lstm) the ff loop must stop
    right after the first drop below the carried max-so-far."""
    f1 = {
        (0.01, 8, 4): 0.3, (0.01, 8, 8): 0.5, (0.01, 8, 16): 0.4,  # break after 16
        (0.01, 9, 4): 0.6, (0.01, 9, 8): 0.2,                       # break after 8
    }
    calls = []

    def fake_train(lr, lstm, ff):
        calls.append((lr, lstm, ff))
        r = TrainResult(flat=np.zeros(1), spec=[])
        r.best_val_f1 = f1[(lr, lstm, ff)]
        return r

    results, best = grid_search(
        fake_train, learning_rates=(0.01,), lstm_sizes=(8, 9), ff_sizes=(4, 8, 16)
    )
    assert calls == [
        (0.01, 8, 4), (0.01, 8, 8), (0.01, 8, 16),  # 0.4 < 0.5 → break (16 ran)
        (0.01, 9, 4), (0.01, 9, 8),                  # 0.2 < 0.6 → break (16 skipped)
    ]
    assert best["val_f1"] == 0.6 and best["lstm_size"] == 9 and best["ff_size"] == 4


def test_training_frame_fasttext_end_to_end(spark):
    """Reference Annotator.train shape on the engine's own encoders:
    tagged tokens → fastText training frame → distributed training →
    save/load the checkpoint → F1 on the training sentences improves over
    the untrained init (tiny corpus; learnable because the tag depends on
    the word identity and fixture fastText vectors are word-determined)."""
    import numpy as np

    from bioner_spark.ner.fasttext import FastTextModel
    from bioner_spark.ner.kernel import SequenceModel
    from bioner_spark.ner.train import training_frame_fasttext

    ft = FastTextModel.fixture(bucket=300, dim=8)
    ent = ["xenon", "xylem", "xeric"]
    filler = ["the", "cat", "sat", "on", "mats", "dog", "runs", "fast"]
    rng = np.random.default_rng(17)
    rows = []
    for d in range(12):
        for s in range(2):
            words, tags = [], []
            for t in range(6):
                if rng.random() < 0.3:
                    words.append(ent[int(rng.integers(len(ent)))])
                    tags.append("B")
                else:
                    words.append(filler[int(rng.integers(len(filler)))])
                    tags.append("O")
            rows += [
                (d, s, t, w, tg) for t, (w, tg) in enumerate(zip(words, tags))
            ]
    tokens = spark.createDataFrame(
        rows, "doc_id long, sentence_id int, token_id int, text string, tag string"
    )
    frame = training_frame_fasttext(tokens, ft).cache()
    got = frame.collect()
    assert len(got) == 24
    assert all(len(r["x"]) == len(r["y"]) == 6 for r in got)
    assert all(len(v) == 8 for r in got for v in r["x"])

    m0 = init_model(input_dim=8, feedforward_size=12, lstm_size=6,
                    n_bilstm_layers=1, seed=3)
    val_df = frame.select("x", "y")
    res = train_distributed(
        spark, frame, val_df, m0, batch_size=12, max_epochs=8, lr=0.03,
        seed=5, n_shards=2, dtype=np.float64,
    )
    base_rows = [(r["x"], r["y"]) for r in got]
    from bioner_spark.ner.train import _eval_rows, _prf1

    f1_init = _prf1(*_eval_rows(m0, base_rows, np.float64))[2]
    assert res.best_val_f1 > f1_init + 0.2  # actually learned the pattern

    # checkpoint roundtrip feeds the inference path
    import tempfile, os

    path = os.path.join(tempfile.mkdtemp(), "trained.npz")
    res.model().save(path)
    loaded = SequenceModel.load(path)
    f1_loaded = _prf1(*_eval_rows(loaded, base_rows, np.float64))[2]
    assert f1_loaded == pytest.approx(res.best_val_f1, abs=1e-6)


# --------------------------------------------------------------------------
# BatchNorm training mode (reference main.py:84 --enableBatchNormalization →
# StackedBiLSTMModel training forward, datexis_model.py:132-188)
# --------------------------------------------------------------------------
def bn_model(dtype=np.float64, **over):
    from bioner_spark.ner.train import bn_buffers_of

    cfg = dict(feedforward_size=7, lstm_size=4, n_bilstm_layers=2, seed=7,
               batch_norm=True)
    cfg.update(over)
    m = init_model(input_dim=5, **cfg)
    bufs = {
        s: (mm.astype(dtype), vv.astype(dtype), eps)
        for s, (mm, vv, eps) in bn_buffers_of(m).items()
    }
    flat = flatten_params(m, dtype)
    return model_from_flat(flat, param_spec(m), bn_buffers=bufs), bufs


@pytest.mark.parametrize("dropout", [None, 0.4])
def test_gradcheck_batchnorm_training(dropout):
    """FD gradient check with BN on: batch statistics make every parameter
    upstream of a BN site couple through mu/var — the analytic backward must
    carry the full BN training-mode gradient, incl. gamma/beta."""
    m, bufs = bn_model()
    spec = param_spec(m)
    assert any(n.endswith("_bn_g") for n, _ in spec)
    x, y, lengths = random_batch()
    masks = None
    if dropout:
        from bioner_spark.ner.train import _mask_dims

        dims = _mask_dims(m)
        masks = [np.ones((x.shape[0], x.shape[1], d)) for d in dims]
        for bi, L in enumerate(lengths):
            ms = dropout_masks_for_sentence(dropout, int(L), dims, 9, 0, bi, np.float64)
            for site, mk in enumerate(ms):
                masks[site][bi, :L] = mk

    logits, cache = forward_train(m, x, lengths, masks)
    _, _, dlogits = cross_entropy_sum(logits, y)
    grads = backward_model(m, cache, dlogits)
    flat = flatten_params(m)
    flat_grad = flatten_grads(grads, spec)

    def _loss(f):
        mm = model_from_flat(f, spec, bn_buffers=bufs)
        lg, _ = forward_train(mm, x, lengths, masks)
        l, _, _ = cross_entropy_sum(lg, y)
        return l

    eps = 1e-6
    rng = np.random.default_rng(3)
    off = 0
    for name, shape in spec:
        size = int(np.prod(shape))
        for idx in rng.choice(size, size=min(4, size), replace=False):
            j = off + int(idx)
            fp = flat.copy(); fp[j] += eps
            fm = flat.copy(); fm[j] -= eps
            num = (_loss(fp) - _loss(fm)) / (2 * eps)
            ana = flat_grad[j]
            assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (
                f"{name}[{idx}]: numeric {num} vs analytic {ana}"
            )
        off += size


def test_bn_site_input_matches_forward_train():
    """bn_site_input (the cache-free stat-pass forward) must compute the
    exact tensor forward_train feeds into each BN site — any traversal
    drift between the two would make the sync-BN stat reductions describe
    a different network than the grad job uses. forward_train's cache
    stores (x̂, inv, γ) per site, so the site input reconstructs as
    x̂/inv + μ."""
    from bioner_spark.ner.train import (
        _mask_dims, _pad_batch, bn_site_input, bn_sites,
    )

    m = init_model(input_dim=6, feedforward_size=5, lstm_size=3,
                   n_bilstm_layers=2, seed=13, batch_norm=True)
    rng = np.random.default_rng(5)
    rows = [
        (i, rng.normal(size=(L, 6)).tolist(), [0] * L)
        for i, L in enumerate([7, 5, 2])
    ]
    for dropout_p in (0.0, 0.3):
        x, _, lengths, masks = _pad_batch(
            rows, 6, np.float64, dropout_p, _mask_dims(m), seed=3, step=0
        )
        _, cache = forward_train(m, x, lengths, masks)
        stats = cache["bn_stats"]
        for site in bn_sites(m):
            xhat, inv, _gamma = cache["bn"][site]
            mu, _var = stats[site]
            recon = xhat / inv + mu
            got = bn_site_input(m, x, lengths, masks, stats, site)
            np.testing.assert_allclose(got, recon, rtol=1e-9, atol=1e-12)


def test_empty_training_set_raises():
    """An upstream mis-join that filters the frame to zero rows must fail
    loudly, not 'train' for max_epochs and return init weights with nan
    loss."""
    m = init_model(input_dim=4, feedforward_size=4, lstm_size=2, seed=1)
    with pytest.raises(ValueError, match="empty training set"):
        train_single_node([], [([[0.0] * 4], [0])], m, batch_size=4)


def test_bn_single_value_batch_refused():
    """torch BatchNorm1d raises 'Expected more than 1 value per channel'
    on a 1-value training batch; the engine mirrors the refusal instead of
    training through var=0 stats the reference cannot reach."""
    from bioner_spark.ner.train import forward_train

    m = init_model(input_dim=4, feedforward_size=4, lstm_size=2, seed=1,
                   batch_norm=True)
    x = np.zeros((1, 1, 4), dtype=np.float64)
    with pytest.raises(ValueError, match="more than 1 value per channel"):
        forward_train(m, x, np.array([1]))


def test_bn_stats_float32_near_constant_channel():
    """E[x²]−E[x]² computed in float32 cancels catastrophically for a
    near-constant channel with large mean (can go NEGATIVE → NaN via
    1/sqrt(var+eps)); _bn_stats must accumulate in float64 and clamp at 0,
    at the trainer's shipping dtype (float32)."""
    from bioner_spark.ner.train import _bn_stats

    rng = np.random.default_rng(0)
    B, T, C = 8, 800, 3
    h = np.full((B, T, C), 100.0, dtype=np.float32)
    h += rng.normal(0.0, 1e-3, size=h.shape).astype(np.float32)
    mu, var = _bn_stats(h, B * T)
    assert mu.dtype == np.float32 and var.dtype == np.float32
    assert np.all(np.isfinite(var)) and np.all(var >= 0.0)
    ref_var = h.astype(np.float64).var(axis=(0, 1))  # exact two-pass
    np.testing.assert_allclose(var, ref_var, rtol=1e-3)
    # the failure mode this guards: the same formula at float32 precision
    # misses the true var by orders of magnitude (or goes negative)
    s2_32 = (h * h).sum(axis=(0, 1), dtype=np.float32) / (B * T)
    mu_32 = h.sum(axis=(0, 1), dtype=np.float32) / (B * T)
    naive = s2_32 - mu_32 * mu_32
    assert np.any(np.abs(naive - ref_var) > 10 * ref_var) or np.any(naive < 0)


def test_bn_lstm_sites_ignore_pad_values():
    """The LSTM-site BN stats are computed over pad-ZEROED tensors (the
    values pad_packed_sequence hands the reference BN), not whatever the
    kernel left at pads — so with the ff BN removed (the one site that
    legitimately sees pad rows, since it runs before the first pack), the
    loss must be invariant to pad input values."""
    import dataclasses

    m, _ = bn_model()
    m = dataclasses.replace(m, ff_bn=None)
    x, y, lengths = random_batch()

    def _loss(xx):
        lg, _ = forward_train(m, xx, lengths, None)
        l, _, _ = cross_entropy_sum(lg, y)
        return l

    base = _loss(x)
    x2 = x.copy()
    for i, L in enumerate(lengths):
        x2[i, L:] = 123.456
    assert _loss(x2) == pytest.approx(base, abs=1e-12)


def test_bn_ff_pad_rows_equal_bias_semantics():
    """The ff BN site sees pad rows equal to the ff bias (reference: BN runs
    on the padded ff1 output before the first pack, and the collated input
    pads are zero). Injecting the global stats computed from a DIFFERENTLY
    padded copy of the same batch must reproduce the same loss — the
    pad-correction the distributed stat reduction applies (n_pad × bias)."""
    m, _ = bn_model(n_bilstm_layers=1)
    x, y, lengths = random_batch()
    logits, cache = forward_train(m, x, lengths, None)
    loss, _, _ = cross_entropy_sum(logits, y)
    # recompute stats by hand: valid-only sums + n_pad * bias corrections
    h0 = x @ m.ff_w.T + m.ff_b
    hz = h0.copy()
    for i, L in enumerate(lengths):
        hz[i, L:] = 0.0
    N = x.shape[0] * x.shape[1]
    n_pad = N - int(lengths.sum())
    s = hz.sum(axis=(0, 1)) + n_pad * m.ff_b
    s2 = (hz * hz).sum(axis=(0, 1)) + n_pad * m.ff_b * m.ff_b
    mu = s / N
    var = s2 / N - mu * mu
    got_mu, got_var = cache["bn_stats"]["ff"]
    np.testing.assert_allclose(mu, got_mu, atol=1e-12)
    np.testing.assert_allclose(var, got_var, atol=1e-12)


def test_bn_running_stats_update_torch_semantics():
    """One training forward must update running stats with momentum 0.1 and
    UNBIASED batch var (N/(N-1)) — torch BatchNorm1d documented behavior."""
    from bioner_spark.ner.train import (
        _update_running_stats, batch_gradient, bn_buffers_of,
    )

    m, bufs = bn_model(n_bilstm_layers=1)
    spec = param_spec(m)
    x, y, lengths = random_batch()
    rows = [(i, x[i, :L].tolist(), y[i, :L].tolist()) for i, L in enumerate(lengths)]
    before = {s: (mm.copy(), vv.copy()) for s, (mm, vv, _) in bufs.items()}
    stats_out: dict = {}
    batch_gradient(m, spec, rows, dropout_p=0.0, seed=1, step=0,
                   dtype=np.float64, stats_out=stats_out)
    N = stats_out["_N"]
    assert N == len(rows) * max(int(L) for L in lengths)
    _update_running_stats(bufs, stats_out, N)
    for s, (mu, var) in ((k, v) for k, v in stats_out.items() if k != "_N"):
        m0, v0 = before[s]
        np.testing.assert_allclose(bufs[s][0], 0.9 * m0 + 0.1 * mu, atol=1e-12)
        np.testing.assert_allclose(
            bufs[s][1], 0.9 * v0 + 0.1 * var * N / (N - 1), atol=1e-12
        )


def test_distributed_matches_single_node_batchnorm(spark):
    """The sync-BN schedule (global batch statistics + global backward
    corrections) must reproduce the single-node BN training run exactly —
    weights AND running buffers."""
    rows = _toy_rows()
    val_rows = [(x, y) for (o, x, y, d, s) in rows[:5]]
    m, _ = bn_model(n_bilstm_layers=1)

    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sentence_id", IntegerType()),
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    df = spark.createDataFrame([(d, s, x, y) for (o, x, y, d, s) in rows], schema)
    ordered, n = assign_doc_shuffled_order(df, seed=42)
    auth_rows = [
        (int(r[0]), r[1], r[2])
        for r in ordered.select("order_idx", "x", "y").collect()
    ]
    single = train_single_node(
        auth_rows, val_rows, m, batch_size=6, max_epochs=2, lr=0.01,
        dropout_p=0.3, seed=42, dtype=np.float64,
    )
    val_schema = StructType(
        [
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    val_df = spark.createDataFrame(val_rows, val_schema)
    dist = train_distributed(
        spark, df, val_df, m, batch_size=6, max_epochs=2, lr=0.01,
        dropout_p=0.3, seed=42, n_shards=3, dtype=np.float64,
    )
    np.testing.assert_allclose(dist.flat, single.flat, rtol=0, atol=1e-9)
    assert dist.bn_buffers is not None and single.bn_buffers is not None
    for s in single.bn_buffers:
        np.testing.assert_allclose(
            dist.bn_buffers[s][0], single.bn_buffers[s][0], atol=1e-9
        )
        np.testing.assert_allclose(
            dist.bn_buffers[s][1], single.bn_buffers[s][1], atol=1e-9
        )
    for h1, h2 in zip(dist.history, single.history):
        assert h1["train_loss"] == pytest.approx(h2["train_loss"], abs=1e-9)
        assert h1["val_f1"] == pytest.approx(h2["val_f1"], abs=1e-12)
    # the trained model round-trips through the npz checkpoint with buffers
    import os, tempfile

    path = os.path.join(tempfile.mkdtemp(), "bn_trained.npz")
    dist.model().save(path)
    from bioner_spark.ner.kernel import SequenceModel

    loaded = SequenceModel.load(path)
    assert loaded.ff_bn is not None


def test_step_reads_only_its_batch_rows(spark):
    """The indexed-block cache must make per-epoch row materialization O(n)
    — each training row is sliced into exactly ONE step's batch per epoch
    (the old per-step shard scan visited n/P rows per shard per step)."""
    rows = _toy_rows(n_docs=8, seed=9)
    val_rows = [(x, y) for (o, x, y, d, s) in rows[:3]]
    m = tiny_model(n_bilstm_layers=1)
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sentence_id", IntegerType()),
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    df = spark.createDataFrame([(d, s, x, y) for (o, x, y, d, s) in rows], schema)
    val_schema = StructType(
        [
            StructField("x", ArrayType(ArrayType(DoubleType()))),
            StructField("y", ArrayType(IntegerType())),
        ]
    )
    val_df = spark.createDataFrame(val_rows, val_schema)
    acc = spark.sparkContext.accumulator(0)
    blk_acc = spark.sparkContext.accumulator(0)
    epochs = 2
    steps_per_block = 2
    train_distributed(
        spark, df, val_df, m, batch_size=5, max_epochs=epochs, lr=0.01,
        seed=7, n_shards=3, steps_per_block=steps_per_block,
        dtype=np.float64, _rows_accumulator=acc,
        _block_rows_accumulator=blk_acc,
    )
    assert acc.value == len(rows) * epochs
    # the partition-pruning guarantee: cached partitions unpickle WHOLE,
    # so the real per-step cost is rows DESERIALIZED, not rows sliced —
    # keying partitions by step block bounds it at steps_per_block × n
    # per epoch (the old shard-scan design deserialized n rows per STEP,
    # i.e. n_steps × n per epoch)
    assert 0 < blk_acc.value <= steps_per_block * len(rows) * epochs
    n_steps = -(-len(rows) // 5)
    assert blk_acc.value < n_steps * len(rows) * epochs
