"""Torch-free ``.pt`` checkpoint import: container format, restricted
unpickling, reference name mapping, and numeric forward parity.

Mirrors the reference's load path ``model.load_state_dict(torch.load(p))``
(annotate_dataset.py:17-18) without torch: the committed fixture was written
in the documented torch-zip layout by scripts/gen_pt_fixture.py, and its
forward logits must match committed goldens exactly.
"""

from __future__ import annotations

import json
import os
import pickle
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from bioner_spark.ner.kernel import init_model
from bioner_spark.ner.torch_import import (
    TorchImportError,
    load_sequence_model,
    load_state_dict,
    model_to_state_dict,
    state_dict_to_model,
    write_state_dict_pt,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
PT_PATH = os.path.join(FIX, "datexis_tiny.pt")
GOLD_PATH = os.path.join(FIX, "datexis_tiny_golden.json")


def test_fixture_is_a_torch_zip_container():
    with zipfile.ZipFile(PT_PATH) as zf:
        names = zf.namelist()
        assert "archive/data.pkl" in names
        assert "archive/version" in names
        assert any(n.startswith("archive/data/") for n in names)
        # the pickle must reference only allowlisted globals — decode the
        # module.name pairs straight from the opcode stream
        import pickletools

        globs = set()
        for op, arg, _ in pickletools.genops(zf.read("archive/data.pkl")):
            if op.name in ("GLOBAL", "STACK_GLOBAL") and arg:
                globs.add(tuple(arg.split(" ")))
        assert ("collections", "OrderedDict") in globs or not globs


def test_load_state_dict_names_and_shapes():
    sd = load_state_dict(PT_PATH)
    assert isinstance(sd, OrderedDict)
    assert sd["ff1.weight"].shape == (10, 12)
    assert sd["biLSTM.weight_ih_l0"].shape == (24, 10)
    assert sd["biLSTM.weight_ih_l0_reverse"].shape == (24, 10)
    assert sd["additional_biLSTM_layers.0.weight_ih_l0"].shape == (24, 12)
    assert sd["encoderLSTM.weight_ih_l0"].shape == (24, 12)
    assert sd["hidden2tag.weight"].shape == (3, 6)
    assert sd["ffBatchNorm.running_mean"].shape == (10,)
    assert sd["biLSTMBatchNorms.1.running_var"].shape == (12,)
    nbt = sd["ffBatchNorm.num_batches_tracked"]
    assert nbt.shape == () and nbt.item() == 100  # scalar tensor stays 0-d
    assert all(
        v.dtype == np.float32 for k, v in sd.items() if "num_batches" not in k
    )


def test_forward_matches_committed_goldens():
    model = load_sequence_model(PT_PATH)
    gold = json.load(open(GOLD_PATH))
    x = np.array(gold["input"], dtype=np.float32)
    lengths = np.array(gold["lengths"])
    logits = model.forward(x, lengths)
    for i, L in enumerate(lengths):
        np.testing.assert_array_equal(
            np.round(logits[i, :L].astype(np.float64), 6),
            np.array(gold["logits"][i]),
        )


def test_roundtrip_model_to_pt_to_model(tmp_path):
    src = init_model(8, feedforward_size=6, lstm_size=4, n_bilstm_layers=1, seed=42)
    p = str(tmp_path / "rt.pt")
    write_state_dict_pt(p, model_to_state_dict(src))
    back = load_sequence_model(p)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 7, 8)).astype(np.float32)
    lengths = np.array([7, 4, 1])
    np.testing.assert_array_equal(src.forward(x, lengths), back.forward(x, lengths))


def test_split_biases_are_summed(tmp_path):
    """torch keeps bias_ih and bias_hh separately; the kernel uses their sum.
    Write a dict where both halves are nonzero and check the import adds."""
    src = init_model(5, feedforward_size=4, lstm_size=3, n_bilstm_layers=1, seed=7)
    sd = model_to_state_dict(src)
    rng = np.random.default_rng(3)
    for k in list(sd):
        if "bias_hh" in k:
            ih = k.replace("bias_hh", "bias_ih")
            split = rng.normal(size=sd[ih].shape).astype(np.float32)
            sd[k] = split
            sd[ih] = sd[ih] - split  # sum unchanged
    p = str(tmp_path / "bias.pt")
    write_state_dict_pt(p, sd)
    back = load_sequence_model(p)
    x = rng.normal(size=(2, 4, 5)).astype(np.float32)
    lengths = np.array([4, 2])
    np.testing.assert_allclose(
        src.forward(x, lengths), back.forward(x, lengths), rtol=0, atol=1e-6
    )


def test_no_batchnorm_model_imports_clean(tmp_path):
    src = init_model(6, feedforward_size=5, lstm_size=3, n_bilstm_layers=2,
                     seed=11, batch_norm=False)
    p = str(tmp_path / "nobn.pt")
    write_state_dict_pt(p, model_to_state_dict(src))
    back = load_sequence_model(p)
    assert back.ff_bn is None and back.enc_bn is None and back.bilstm_bns is None
    assert len(back.bilstms) == 2


def test_malicious_global_rejected(tmp_path):
    """A pickle smuggling os.system must raise, not execute."""
    evil = pickle.dumps(OrderedDict(), protocol=2)
    # splice in a benign-looking dict but with an os.system global
    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    payload = pickle.dumps({"w": Evil()}, protocol=2)
    p = tmp_path / "evil.pt"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
        zf.writestr("archive/version", "3\n")
    with pytest.raises(TorchImportError, match="disallowed global"):
        load_state_dict(str(p))
    assert evil  # silence unused warning


def test_not_a_zip_rejected(tmp_path):
    p = tmp_path / "legacy.pt"
    p.write_bytes(b"\x80\x02}q\x00.")
    with pytest.raises(TorchImportError, match="torch-zip"):
        load_state_dict(str(p))


def test_missing_reference_keys_rejected():
    with pytest.raises(TorchImportError, match="missing reference keys"):
        state_dict_to_model({"ff1.weight": np.zeros((2, 2), dtype=np.float32)})


def test_nonstandard_prefix_accepted(tmp_path):
    """torch names the archive dir after the file stem in some writers —
    the loader keys off */data.pkl, not a literal 'archive'."""
    src = init_model(4, feedforward_size=3, lstm_size=2, n_bilstm_layers=1, seed=5)
    p = str(tmp_path / "other.pt")
    write_state_dict_pt(p, model_to_state_dict(src), prefix="best_model_42")
    back = load_sequence_model(p)
    assert back.input_dim == 4


def test_rebuild_tensor_bounds_checked():
    """shape/stride/offset come from the untrusted pickle: a stride that
    walks past the storage must raise, never read out-of-bounds memory."""
    from bioner_spark.ner.torch_import import _rebuild_tensor

    storage = np.arange(4, dtype=np.float32)
    # legitimate contiguous view still works
    ok = _rebuild_tensor(storage, 0, (2, 2), (2, 1))
    assert ok.tolist() == [[0.0, 1.0], [2.0, 3.0]]
    # scalar
    assert _rebuild_tensor(storage, 3, (), ()).item() == 3.0
    # zero-size dim → empty, no storage touch
    assert _rebuild_tensor(storage, 0, (0, 5), (1, 1)).size == 0
    with pytest.raises(TorchImportError, match="past storage"):
        _rebuild_tensor(storage, 0, (4,), (100000,))
    with pytest.raises(TorchImportError, match="negative"):
        _rebuild_tensor(storage, 3, (4,), (-1,))
    with pytest.raises(TorchImportError, match="outside storage"):
        _rebuild_tensor(storage, 10, (1,), (1,))
    with pytest.raises(TorchImportError, match="past storage"):
        _rebuild_tensor(storage, 2, (4,), (1,))  # offset + extent overflows
    with pytest.raises(TorchImportError, match="rank"):
        _rebuild_tensor(storage, 0, (2, 2), (1,))
    # allocation DoS: stride-0 dims keep `last` inside the storage while
    # the materialized copy would be prod(size) elements — a crafted
    # (2^20, 2^20) stride-(0,0) view must be rejected, not allocated
    with pytest.raises(TorchImportError, match="broadcast/expanded"):
        _rebuild_tensor(storage, 0, (2**20, 2**20), (0, 0))
    with pytest.raises(TorchImportError, match="broadcast/expanded"):
        _rebuild_tensor(storage, 2, (3,), (0,))  # 3 elems, 2 left past offset


def test_tampered_checkpoint_stride_rejected(tmp_path):
    """End-to-end: a .pt whose pickle declares a stride larger than its
    storage is rejected at load (the as_strided OOB-read exploit)."""
    import zipfile

    src = init_model(4, feedforward_size=3, lstm_size=2, n_bilstm_layers=1, seed=7)
    p = str(tmp_path / "evil.pt")
    write_state_dict_pt(p, model_to_state_dict(src))
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
        pkl_name = [n for n in names if n.endswith("/data.pkl")][0]
        data = {n: zf.read(n) for n in names}
    # every stored stride tuple in the pickle is contiguous row-major ints;
    # corrupt by swapping a BININT1 stride value 1 -> 251 wherever a stride
    # tuple is emitted is brittle, so instead rewrite one storage entry to
    # be shorter than its tensor claims (equivalent OOB condition: the
    # persistent-id numel shrinks but shape/stride stay).
    storage_keys = [n for n in names if "/data/" in n]
    victim = storage_keys[0]
    data[victim] = data[victim][:4]  # truncate storage to 1 float32
    evil = str(tmp_path / "evil2.pt")
    with zipfile.ZipFile(evil, "w", zipfile.ZIP_STORED) as zf:
        for n in names:
            zf.writestr(n, data[n])
    with pytest.raises((TorchImportError, ValueError)):
        load_state_dict(evil)


def _reference_lstm_names(prefix, bidirectional):
    names = []
    sufs = ("", "_reverse") if bidirectional else ("",)
    for suf in sufs:
        names += [
            f"{prefix}.weight_ih_l0{suf}", f"{prefix}.weight_hh_l0{suf}",
            f"{prefix}.bias_ih_l0{suf}", f"{prefix}.bias_hh_l0{suf}",
        ]
    return names


def test_full_bioner_checkpoint_shape(tmp_path):
    """A .pt fixture with the REAL released BioNER architecture — every
    parameter name the reference model emits (bioner_model.py:22-33: ff1
    2048, biLSTM 1024, additional_biLSTM_layers.0/1, encoderLSTM 1024,
    hidden2tag) at full size, authored from the reference naming scheme
    (not via model_to_state_dict) — must import with every name consumed
    and run a forward."""
    rng = np.random.default_rng(77)
    D, FF, H = 300, 2048, 1024  # fastText dim, reference sizes

    def t(*shape):
        return (rng.standard_normal(shape) * 0.01).astype(np.float32)

    sd = {"ff1.weight": t(FF, D), "ff1.bias": t(FF)}

    def lstm(prefix, d_in, bidirectional):
        for name in _reference_lstm_names(prefix, bidirectional):
            if "weight_ih" in name:
                sd[name] = t(4 * H, d_in)
            elif "weight_hh" in name:
                sd[name] = t(4 * H, H)
            else:
                sd[name] = t(4 * H)

    lstm("biLSTM", FF, True)
    lstm("additional_biLSTM_layers.0", 2 * H, True)
    lstm("additional_biLSTM_layers.1", 2 * H, True)
    lstm("encoderLSTM", 2 * H, False)
    sd["hidden2tag.weight"] = t(3, H)
    sd["hidden2tag.bias"] = t(3)

    expected_names = set(sd)
    pt = str(tmp_path / "bioner_full.pt")
    write_state_dict_pt(pt, sd)
    model = load_sequence_model(pt, name="BioNER")

    assert model.input_dim == D
    assert model.ff_w.shape == (FF, D)
    assert len(model.bilstms) == 3
    for fwd, bwd in model.bilstms:
        assert fwd[1].shape == (4 * H, H) and bwd[1].shape == (4 * H, H)
    assert model.bilstms[0][0][0].shape == (4 * H, FF)
    assert model.bilstms[1][0][0].shape == (4 * H, 2 * H)
    assert model.enc_w_ih.shape == (4 * H, 2 * H)
    assert model.out_w.shape == (3, H)
    assert model.ff_bn is None and model.enc_bn is None

    # every reference name maps back out — nothing silently dropped
    back = model_to_state_dict(model)
    assert set(back) == expected_names

    # forward runs at full size
    x = rng.standard_normal((2, 5, D)).astype(np.float32)
    lengths = np.array([5, 3])
    tags = model.predict_tags(x, lengths)
    assert [len(tg) for tg in tags] == [5, 3]


def test_full_stacked_bn_checkpoint_name_set(tmp_path):
    """StackedBiLSTMModel with BatchNorm enabled (datexis_model.py:105-109):
    the complete reference name set incl. ffBatchNorm, biLSTMBatchNorms.N,
    encoderLSTMBatchNorm and their num_batches_tracked buffers must import
    name-for-name (small dims; the naming is dimension-independent)."""
    rng = np.random.default_rng(78)
    D, FF, H, LAYERS = 6, 8, 4, 3

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {"ff1.weight": t(FF, D), "ff1.bias": t(FF)}

    def lstm(prefix, d_in, bidirectional):
        for name in _reference_lstm_names(prefix, bidirectional):
            if "weight_ih" in name:
                sd[name] = t(4 * H, d_in)
            elif "weight_hh" in name:
                sd[name] = t(4 * H, H)
            else:
                sd[name] = t(4 * H)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = np.abs(t(c)) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.array(7, dtype=np.int64)

    lstm("biLSTM", FF, True)
    for i in range(LAYERS - 1):
        lstm(f"additional_biLSTM_layers.{i}", 2 * H, True)
    lstm("encoderLSTM", 2 * H, False)
    sd["hidden2tag.weight"] = t(3, H)
    sd["hidden2tag.bias"] = t(3)
    bn("ffBatchNorm", FF)
    for i in range(LAYERS):
        bn(f"biLSTMBatchNorms.{i}", 2 * H)
    bn("encoderLSTMBatchNorm", H)

    pt = str(tmp_path / "stacked_bn.pt")
    write_state_dict_pt(pt, sd)
    model = load_sequence_model(pt)
    assert model.ff_bn is not None and model.enc_bn is not None
    assert model.bilstm_bns is not None
    assert sum(b is not None for b in model.bilstm_bns) == LAYERS
    back = model_to_state_dict(model)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(
        back["biLSTMBatchNorms.2.running_var"], sd["biLSTMBatchNorms.2.running_var"]
    )


def test_big_endian_checkpoint_rejected(tmp_path):
    """Storage dtypes are hard-coded little-endian; a big-endian-saved
    checkpoint must fail loudly, not load byte-swapped garbage weights."""
    import zipfile

    src = str(tmp_path / "le.pt")
    write_state_dict_pt(src, {"w": np.ones((2, 2), dtype=np.float32)})
    dst = str(tmp_path / "be.pt")
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dst, "w") as zout:
        for n in zin.namelist():
            data = zin.read(n)
            if n.endswith("/byteorder"):
                data = b"big"
            zout.writestr(n, data)
    with pytest.raises(TorchImportError, match="byte order"):
        load_state_dict(dst)


def test_missing_storage_entry_raises_import_error(tmp_path):
    """A checkpoint whose pickle references an absent data/<key> entry must
    raise TorchImportError (the class contract), not a raw KeyError."""
    import zipfile

    src = str(tmp_path / "ok.pt")
    write_state_dict_pt(src, {"w": np.ones((2, 2), dtype=np.float32)})
    dst = str(tmp_path / "hole.pt")
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dst, "w") as zout:
        for n in zin.namelist():
            if "/data/" in n:
                continue  # drop every storage payload
            zout.writestr(n, zin.read(n))
    with pytest.raises(TorchImportError):
        load_state_dict(dst)
