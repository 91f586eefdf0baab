"""NER kernel correctness: differential vs a scalar (unvectorized) LSTM,
packed-sequence padding invariance, and Spark-vs-single-node parity of the
full inference operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bioner_spark.ner.kernel import (
    SequenceModel,
    bilstm_forward,
    init_model,
    load_model_config,
    lstm_forward,
)


def _scalar_lstm(x, w_ih, w_hh, b):
    """Deliberately naive per-timestep, per-sequence implementation."""
    B, T, D = x.shape
    H = w_hh.shape[1]
    out = np.zeros((B, T, H))
    for i in range(B):
        h = np.zeros(H)
        c = np.zeros(H)
        for t in range(T):
            gates = w_ih @ x[i, t] + w_hh @ h + b
            ig = 1 / (1 + np.exp(-gates[:H]))
            fg = 1 / (1 + np.exp(-gates[H : 2 * H]))
            gg = np.tanh(gates[2 * H : 3 * H])
            og = 1 / (1 + np.exp(-gates[3 * H :]))
            c = fg * c + ig * gg
            h = og * np.tanh(c)
            out[i, t] = h
    return out


def test_lstm_forward_matches_scalar():
    rng = np.random.default_rng(1234)
    x = rng.normal(size=(3, 5, 4)).astype(np.float64)
    w_ih = rng.normal(size=(16, 4))
    w_hh = rng.normal(size=(16, 4))
    b = rng.normal(size=16)
    np.testing.assert_allclose(
        lstm_forward(x, w_ih, w_hh, b), _scalar_lstm(x, w_ih, w_hh, b), rtol=1e-10
    )


def test_bilstm_padding_invariance():
    """Packed-sequence semantics: a sequence's outputs must not depend on
    other sequences' pads (reference uses pack_padded_sequence,
    datexis_model.py:55-58)."""
    rng = np.random.default_rng(42)
    H = 6
    fwd = (rng.normal(size=(4 * H, 3)), rng.normal(size=(4 * H, H)), rng.normal(size=4 * H))
    bwd = (rng.normal(size=(4 * H, 3)), rng.normal(size=(4 * H, H)), rng.normal(size=4 * H))
    lengths = np.array([5, 2, 4])
    x = rng.normal(size=(3, 5, 3))
    for i, L in enumerate(lengths):
        x[i, L:] = 999.0  # poison the pads
    batched = bilstm_forward(x, lengths, fwd, bwd)
    for i, L in enumerate(lengths):
        solo = bilstm_forward(x[i : i + 1, :L], np.array([L]), fwd, bwd)
        np.testing.assert_allclose(batched[i, :L], solo[0], rtol=1e-10)


def test_model_forward_padding_invariance_and_determinism():
    model = init_model(input_dim=15 + 23, seed=1234)
    rng = np.random.default_rng(7)
    lengths = np.array([6, 3])
    x = rng.normal(size=(2, 6, 38)).astype(np.float32)
    x[1, 3:] = 777.0
    tags1 = model.predict_tags(x, lengths)
    tags2 = model.predict_tags(x.copy(), lengths.copy())
    assert tags1 == tags2
    assert [len(t) for t in tags1] == [6, 3]
    solo = model.predict_tags(x[1:2, :3], np.array([3]))
    assert tags1[1] == solo[0]
    assert all(t in ("B", "I", "O") for s in tags1 for t in s)


def test_model_registry():
    m = load_model_config("DATEXIS-NER", input_dim=38)
    assert m.ff_w.shape == (150, 38)
    assert len(m.bilstms) == 1
    m2 = load_model_config("CustomConfig_Stacked-DATEXIS-NER", input_dim=38)
    assert len(m2.bilstms) == 2
    with pytest.raises(ValueError):
        load_model_config("nope", input_dim=10)


def test_save_load_roundtrip(tmp_path):
    m = init_model(input_dim=20, seed=99)
    p = str(tmp_path / "weights.npz")
    m.save(p)
    m2 = SequenceModel.load(p)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 20)).astype(np.float32)
    lengths = np.array([4, 2])
    np.testing.assert_array_equal(m.forward(x, lengths), m2.forward(x, lengths))


def test_golden_logits_regression(tmp_path):
    """Regression lock (FIXTURES.md §7): fixed seed + fixed input → logits
    must stay bit-stable across refactors of the kernel."""
    import os

    model = init_model(input_dim=10, feedforward_size=8, lstm_size=4, seed=1234)
    rng = np.random.default_rng(1234)
    x = rng.normal(size=(2, 5, 10)).astype(np.float32)
    lengths = np.array([5, 3])
    logits = model.forward(x, lengths)
    golden_path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_logits.npz")
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez(golden_path, logits=logits)
    golden = np.load(golden_path)["logits"]
    np.testing.assert_allclose(logits, golden, rtol=1e-6)


def test_batchnorm_identity_stats_is_noop():
    """BN with gamma=1, beta=0, mean=0, var=1-eps equals the BN-free model —
    placement sanity for the inference affine."""
    base = init_model(input_dim=10, feedforward_size=8, lstm_size=4, seed=5)
    eps = 1e-5
    ident = lambda c: (  # noqa: E731
        np.ones(c, dtype=np.float32), np.zeros(c, dtype=np.float32),
        np.zeros(c, dtype=np.float32), np.full(c, 1.0 - eps, dtype=np.float32), eps,
    )
    bn = init_model(input_dim=10, feedforward_size=8, lstm_size=4, seed=5)
    bn.ff_bn = ident(8)
    bn.bilstm_bns = [ident(8)]
    bn.enc_bn = ident(4)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, 10)).astype(np.float32)
    lengths = np.array([6, 4])
    np.testing.assert_allclose(
        bn.forward(x, lengths), base.forward(x, lengths), rtol=1e-5, atol=1e-6
    )


def test_init_model_bn_identity_flag():
    """bn_identity=True is torch's fresh-BatchNorm1d state (what a
    reference TRAINING run starts from): gamma=1, beta=0, running mean 0 /
    var 1 at every site, tuple order matching _bn_params — and with those
    stats the inference forward equals the BN-free model up to the
    1/sqrt(1+eps) epsilon shift."""
    m = init_model(input_dim=10, feedforward_size=8, lstm_size=4,
                   n_bilstm_layers=2, seed=7, batch_norm=True,
                   bn_identity=True)
    sites = [(m.ff_bn, 8)] + [(b, 8) for b in m.bilstm_bns] + [(m.enc_bn, 4)]
    for bn, c in sites:
        gamma, beta, mean, var, eps = bn
        np.testing.assert_array_equal(gamma, np.ones(c, dtype=np.float32))
        np.testing.assert_array_equal(beta, np.zeros(c, dtype=np.float32))
        np.testing.assert_array_equal(mean, np.zeros(c, dtype=np.float32))
        np.testing.assert_array_equal(var, np.ones(c, dtype=np.float32))
        assert eps == 1e-5
    base = init_model(input_dim=10, feedforward_size=8, lstm_size=4,
                      n_bilstm_layers=2, seed=7)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 6, 10)).astype(np.float32)
    lengths = np.array([6, 4])
    np.testing.assert_allclose(
        m.forward(x, lengths), base.forward(x, lengths), rtol=1e-4, atol=1e-4
    )


def test_batchnorm_placement_differential():
    """Non-trivial BN stats: forward must equal a hand-applied affine at the
    reference's exact placement (FF pre-ReLU → each BiLSTM → encoder LSTM;
    datexis_model.py:132-167)."""
    from bioner_spark.ner.kernel import batchnorm_infer, bilstm_forward, lstm_forward

    m = init_model(
        input_dim=10, feedforward_size=8, lstm_size=4, n_bilstm_layers=2,
        seed=11, batch_norm=True,
    )
    assert m.ff_bn is not None and m.enc_bn is not None and len(m.bilstm_bns) == 2
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 10)).astype(np.float32)
    lengths = np.array([5, 3])
    h = batchnorm_infer(x @ m.ff_w.T + m.ff_b, m.ff_bn)
    h = np.maximum(h, 0.0)
    for i, (fwd, bwd) in enumerate(m.bilstms):
        h = batchnorm_infer(bilstm_forward(h, lengths, fwd, bwd), m.bilstm_bns[i])
    h = batchnorm_infer(lstm_forward(h, m.enc_w_ih, m.enc_w_hh, m.enc_b), m.enc_bn)
    expected = h @ m.out_w.T + m.out_b
    np.testing.assert_allclose(m.forward(x, lengths), expected, rtol=1e-6)


def test_golden_logits_stacked_bn(tmp_path):
    """Regression lock for the stacked+BN fixture (VERDICT round-1 item 6):
    fixed seed + fixed input → logits bit-stable across kernel refactors."""
    import os

    model = load_model_config(
        "CustomConfig_Stacked-DATEXIS-NER", input_dim=10,
        feedforward_size=8, lstm_size=4, seed=1234,
    )
    assert model.ff_bn is not None  # the stacked config enables BN
    rng = np.random.default_rng(1234)
    x = rng.normal(size=(2, 5, 10)).astype(np.float32)
    lengths = np.array([5, 3])
    logits = model.forward(x, lengths)
    golden_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "golden_logits_stacked_bn.npz"
    )
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez(golden_path, logits=logits)
    golden = np.load(golden_path)["logits"]
    np.testing.assert_allclose(logits, golden, rtol=1e-6)


def test_save_load_roundtrip_with_bn(tmp_path):
    m = init_model(input_dim=12, feedforward_size=6, lstm_size=3,
                   n_bilstm_layers=2, seed=21, batch_norm=True)
    p = str(tmp_path / "bn_weights.npz")
    m.save(p)
    m2 = SequenceModel.load(p)
    assert m2.ff_bn is not None and m2.enc_bn is not None
    assert len(m2.bilstm_bns) == 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 12)).astype(np.float32)
    lengths = np.array([4, 2])
    np.testing.assert_array_equal(m.forward(x, lengths), m2.forward(x, lengths))


def test_sparkfiles_model_shipping(spark, corpus):
    """ship_model → SparkFiles name → identical tags to the closure path,
    with the closure carrying only a file-name string."""
    from bioner_spark import corpus as corpus_mod  # noqa: F401
    from bioner_spark.functions.ngrams import build_vocabulary
    from bioner_spark.ner.infer import annotate_tokens, ship_model
    from bioner_spark.schemas import TOKENS_SCHEMA

    tokens_pd = corpus.tokens.head(300).copy()
    tokens = spark.createDataFrame(tokens_pd, schema=TOKENS_SCHEMA).drop("tag")
    vocab = build_vocabulary(tokens, min_word_frequency=1).cache()
    vocab_size = vocab.count()
    model = init_model(input_dim=15 + vocab_size, seed=1234)
    ref = model
    fname = ship_model(spark, model, name="test_ship")
    key = ["doc_id", "sentence_id", "token_id"]
    got_file = (
        annotate_tokens(tokens, vocab, fname).select(*key, "tag").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    got_closure = (
        annotate_tokens(tokens, vocab, ref).select(*key, "tag").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_file, got_closure)


def test_spark_inference_matches_single_node(spark, corpus):
    """End-to-end parity: Spark mapInPandas inference == single-node numpy
    on the same features (the 'no per-row Python / same-kernel' invariant)."""
    from bioner_spark import corpus as corpus_mod
    from bioner_spark.functions.ngrams import build_vocabulary
    from bioner_spark.ner.infer import annotate_tokens
    from bioner_spark.schemas import TOKENS_SCHEMA

    tokens_pd = corpus.tokens.head(500).copy()  # a few docs' worth
    tokens = spark.createDataFrame(tokens_pd, schema=TOKENS_SCHEMA)
    vocab = build_vocabulary(tokens, min_word_frequency=1).cache()
    vocab_size = vocab.count()
    model = init_model(input_dim=15 + vocab_size, seed=1234)

    got = (
        annotate_tokens(tokens.drop("tag"), vocab, model)
        .select("doc_id", "sentence_id", "token_id", "tag")
        .toPandas()
        .sort_values(["doc_id", "sentence_id", "token_id"])
        .reset_index(drop=True)
    )
    # single-node: encode the same features via the Spark-side encoders once
    # (collect), then run the kernel per sentence un-batched.
    from bioner_spark.ner.infer import encoded_sentences

    sents = encoded_sentences(tokens.drop("tag"), vocab).toPandas()
    expected = {}
    for _, row in sents.iterrows():
        T = len(row["token_ids"])
        x = np.zeros((1, T, 15 + vocab_size), dtype=np.float32)
        for t in range(T):
            x[0, t, :15] = np.asarray(row["feat_dense"][t], dtype=np.float32)
            for ix in row["feat_sparse"][t]:
                x[0, t, 15 + ix] = 1.0
        tags = model.predict_tags(x, np.array([T]))[0]
        for t, tag in enumerate(tags):
            expected[(row["doc_id"], row["sentence_id"], row["token_id"][t] if False else row["token_ids"][t])] = tag
    got_map = {
        (r.doc_id, r.sentence_id, r.token_id): r.tag for r in got.itertuples()
    }
    assert got_map == expected


def test_save_load_preserves_model_name(tmp_path):
    """Without the name entry in the npz, load() silently relabels every
    architecture 'DATEXIS-NER' — name drives BN placement elsewhere."""
    m = init_model(input_dim=12, seed=7, name="BioNER")
    p = str(tmp_path / "w.npz")
    m.save(p)
    assert SequenceModel.load(p).name == "BioNER"


def test_reverse_by_length_zero_length_row():
    from bioner_spark.ner.kernel import _reverse_by_length

    x = np.arange(12, dtype=np.float32).reshape(2, 3, 2)
    out = _reverse_by_length(x, np.array([0, 3]))
    np.testing.assert_array_equal(out[0], x[0])  # untouched, not broadcast-crashed
    np.testing.assert_array_equal(out[1], x[1, ::-1])


def test_save_load_symmetric_without_npz_extension(tmp_path):
    """save(path) must write to EXACTLY path: np.savez_compressed(str)
    appends .npz to extension-less paths, so save('/m/best') +
    load('/m/best') — the same configured string — used to
    FileNotFoundError."""
    import os

    m = init_model(input_dim=8, seed=3)
    p = str(tmp_path / "best")  # no extension, like a model_save_path knob
    m.save(p)
    assert os.path.isfile(p)
    m2 = SequenceModel.load(p)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 8)).astype(np.float32)
    np.testing.assert_array_equal(m.forward(x, np.array([3])), m2.forward(x, np.array([3])))


def test_ship_npz_rejects_name_reuse(spark):
    """Re-shipping an explicit name would silently serve stale weights
    (addFile ignores re-registration, warm workers cache by name) — the
    shared helper must raise instead."""
    from bioner_spark.ner.infer import ship_model

    m = init_model(input_dim=6, seed=1)
    name = "reuse_probe_model"
    ship_model(spark, m, name=name)
    with pytest.raises(ValueError, match="already shipped"):
        ship_model(spark, m, name=name)


def test_ship_npz_failed_save_does_not_burn_name(spark):
    """A ship whose save_fn raised never reached any worker cache, so the
    once-per-app rule must not reject a retry of the same name."""
    from bioner_spark.ner.shipping import ship_npz

    def boom(_path):
        raise OSError("disk full")

    name = "retry_probe_model"
    with pytest.raises(OSError, match="disk full"):
        ship_npz(spark, boom, name=name, default_prefix="m")
    m = init_model(input_dim=6, seed=2)
    fname = ship_npz(spark, m.save, name=name, default_prefix="m")
    assert fname == f"{name}.npz"


def test_ship_npz_reserves_name_before_save(spark):
    """The once-per-app key must be reserved BEFORE save_fn runs: with
    registration deferred to after save+addFile, a concurrent ship of the
    same name during the (slow, ~300 MB) save passes the duplicate check
    too — its addFile is silently ignored and warm workers serve the FIRST
    artifact under the second caller's name. Simulated deterministically by
    re-shipping from INSIDE save_fn (same window, no thread timing)."""
    from bioner_spark.ner.shipping import ship_npz

    m = init_model(input_dim=6, seed=3)
    name = "race_probe_model"
    raised_inside = []

    def save_and_reship(path):
        with pytest.raises(ValueError, match="already shipped"):
            ship_npz(spark, m.save, name=name, default_prefix="m")
        raised_inside.append(True)
        m.save(path)

    fname = ship_npz(spark, save_and_reship, name=name, default_prefix="m")
    assert fname == f"{name}.npz" and raised_inside == [True]
