"""Torch-free reader/writer for PyTorch ``.pt`` checkpoint files.

The reference releases trained model weights as torch checkpoints and loads
them with ``model.load_state_dict(torch.load(model_path))`` (reference
annotate_dataset.py:17-18; checkpoints produced by ignite's Checkpoint
handler, bioner/model/annotator.py:144-150). Torch is not in this
environment, but the serialization format is public (pytorch/pytorch
``torch/serialization.py`` ``_save``/``_load``, zipfile container since
torch 1.6):

* the ``.pt`` file is an uncompressed ZIP archive with one top-level
  prefix directory (commonly ``archive/``):
    - ``<prefix>/data.pkl``  — a pickle (protocol 2) of the saved object;
      every tensor is a ``torch._utils._rebuild_tensor_v2(storage,
      storage_offset, size, stride, requires_grad, backward_hooks)`` call
      whose ``storage`` argument is a pickle PERSISTENT ID
      ``('storage', <StorageClass>, key, location, numel)``
    - ``<prefix>/data/<key>`` — the raw little-endian storage bytes
    - ``<prefix>/version``, optionally ``<prefix>/byteorder``

* a ``state_dict`` is a ``collections.OrderedDict[str, Tensor]``, so the
  pickle needs exactly three kinds of globals: ``OrderedDict``, the
  ``_rebuild_tensor*`` helpers, and the ``torch.XStorage`` dtype markers.

``load_state_dict`` unpickles with a RESTRICTED Unpickler that admits only
that allowlist (anything else — ``os.system`` etc. — raises), rebuilding
each tensor as a numpy array straight from the zip entry bytes.

``write_state_dict_pt`` produces the same layout from numpy arrays so tests
and fixtures can round-trip real-format files without torch; it temporarily
installs minimal ``torch``/``torch._utils`` shim modules (pickle resolves
globals through ``sys.modules``) and removes them afterwards.

``load_sequence_model`` maps the reference's parameter names
(``ff1.* / biLSTM.* / additional_biLSTM_layers.N.* / encoderLSTM.* /
hidden2tag.*`` + the optional BatchNorm entries — datexis_model.py:96-109,
bioner_model.py:23-33) onto the numpy inference kernel's ``SequenceModel``,
summing torch's split LSTM biases (b_ih + b_hh) into the kernel's single
bias per direction.
"""

from __future__ import annotations

import contextlib
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np

from bioner_spark.ner.kernel import SequenceModel

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}

BN_EPS_DEFAULT = 1e-5  # torch BatchNorm1d default; eps is an arg, not state


class TorchImportError(ValueError):
    """Malformed / unsupported .pt file, or a pickle global outside the
    state_dict allowlist."""


class _StorageType:
    """Stands in for the ``torch.XStorage`` class object in the pickle."""

    def __init__(self, name: str):
        if name not in _STORAGE_DTYPES:
            raise TorchImportError(f"unsupported storage type torch.{name}")
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]

    def __repr__(self):  # pragma: no cover - debug only
        return f"_StorageType({self.name})"


def _rebuild_tensor(storage: np.ndarray, offset: int, size, stride, *rest):
    """torch._utils._rebuild_tensor_v2 semantics over a 1-D numpy storage:
    strides are in ELEMENTS; copy so the result owns its memory.

    shape/stride/offset come straight from the (untrusted) pickle, so they
    are bounds-checked BEFORE as_strided — a crafted checkpoint must not be
    able to read out-of-bounds process memory through a stride that walks
    past the storage buffer."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    offset = int(offset)
    if offset < 0 or offset > storage.size:
        raise TorchImportError(
            f"tensor storage_offset {offset} outside storage of {storage.size}"
        )
    if not size:
        if offset >= storage.size:
            raise TorchImportError("scalar tensor offset at/past end of storage")
        return storage[offset : offset + 1].copy().reshape(())
    if len(stride) != len(size):
        raise TorchImportError(
            f"tensor stride rank {len(stride)} != shape rank {len(size)}"
        )
    if any(d < 0 for d in size) or any(s < 0 for s in stride):
        raise TorchImportError(
            f"negative tensor shape/stride in checkpoint: size={size} stride={stride}"
        )
    if any(d == 0 for d in size):
        return np.empty(size, dtype=storage.dtype)
    # furthest element this view can touch, in elements from storage[0]
    last = offset + sum((d - 1) * s for d, s in zip(size, stride))
    if last >= storage.size:
        raise TorchImportError(
            f"tensor view (offset={offset}, size={size}, stride={stride}) "
            f"reads element {last} past storage of {storage.size}"
        )
    # allocation cap: zero strides make `last` small while the MATERIALIZED
    # copy below is prod(size) elements — a crafted (2^20, 2^20) stride-(0,0)
    # view would pass the range check and OOM the driver on view.copy().
    # state_dict tensors are contiguous, so prod(size) never exceeds the
    # storage tail; broadcast/expanded views are rejected by design here.
    n_elem = 1
    for d in size:
        n_elem *= d
    if n_elem > storage.size - offset:
        raise TorchImportError(
            f"tensor declares {n_elem} elements but storage holds only "
            f"{storage.size - offset} past its offset (broadcast/expanded "
            f"views are not accepted from untrusted checkpoints)"
        )
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return view.copy()


def _rebuild_parameter(tensor, requires_grad=True, hooks=None):
    return tensor


class _RestrictedUnpickler(pickle.Unpickler):
    """Allowlist-only unpickler for torch state_dict payloads."""

    _ALLOWED = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    }

    def __init__(self, file, read_storage):
        super().__init__(file, encoding="utf-8")
        self._read_storage = read_storage

    def find_class(self, module, name):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        raise TorchImportError(
            f"disallowed global {module}.{name} in checkpoint pickle"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise TorchImportError(f"unexpected persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        return self._read_storage(str(key), storage_type.dtype, int(numel))


def load_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """Read a torch-zip ``.pt`` state_dict into name → numpy array."""
    if not zipfile.is_zipfile(path):
        raise TorchImportError(
            f"{path} is not a torch-zip checkpoint (legacy pre-1.6 "
            "torch.save format is not supported)"
        )
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if len(pkl_names) != 1:
            raise TorchImportError(
                f"expected exactly one */data.pkl in {path}, "
                f"found {pkl_names or zf.namelist()[:5]}"
            )
        prefix = pkl_names[0][: -len("data.pkl")]

        # _STORAGE_DTYPES are hard-coded little-endian; a checkpoint saved
        # on a big-endian host declares it here — loading it anyway would
        # silently byte-swap every weight (garbage predictions, no error)
        bo_name = f"{prefix}byteorder"
        if bo_name in zf.namelist():
            bo = zf.read(bo_name).decode("ascii", "replace").strip()
            if bo != "little":
                raise TorchImportError(
                    f"checkpoint byte order {bo!r} is not supported "
                    "(little-endian storages only)"
                )

        def read_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            try:
                raw = zf.read(f"{prefix}data/{key}")
            except KeyError as e:
                raise TorchImportError(
                    f"checkpoint references missing storage entry "
                    f"{prefix}data/{key}"
                ) from e
            if len(raw) < numel * dtype.itemsize:
                raise TorchImportError(
                    f"storage {key}: {len(raw)} bytes < declared "
                    f"{numel} x {dtype.itemsize}"
                )
            return np.frombuffer(raw, dtype=dtype, count=numel)

        with zf.open(pkl_names[0]) as f:
            try:
                obj = _RestrictedUnpickler(f, read_storage).load()
            except TorchImportError:
                raise
            except Exception as e:
                # the class contract is TorchImportError for ANY malformed
                # .pt — never a raw KeyError/ValueError/AttributeError from
                # pickle internals that an `except TorchImportError`
                # caller would miss
                raise TorchImportError(
                    f"malformed checkpoint pickle: {type(e).__name__}: {e}"
                ) from e
    if not isinstance(obj, (dict, OrderedDict)):
        raise TorchImportError(f"checkpoint holds {type(obj).__name__}, not a dict")
    return OrderedDict(
        (str(k), np.asarray(v)) for k, v in obj.items()
    )


# ---------------------------------------------------------------------------
# writer (fixtures / tests): emit the same container from numpy arrays
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def _torch_shim_modules():
    """Install minimal fake ``torch`` / ``torch._utils`` modules so the
    stdlib pickler can emit the GLOBAL opcodes a real torch.save emits.
    Test/fixture-only; always uninstalled, and refuses to shadow a real
    torch installation."""
    if "torch" in sys.modules:  # pragma: no cover - env has no torch
        raise RuntimeError("refusing to shadow an existing torch module")
    torch_mod = types.ModuleType("torch")
    utils_mod = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*args):  # never called at write time
        raise NotImplementedError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils_mod._rebuild_tensor_v2 = _rebuild_tensor_v2
    storage_classes = {}
    for name in _STORAGE_DTYPES:
        cls = type(name, (), {"__module__": "torch"})
        setattr(torch_mod, name, cls)
        storage_classes[name] = cls
    torch_mod._utils = utils_mod
    sys.modules["torch"] = torch_mod
    sys.modules["torch._utils"] = utils_mod
    try:
        yield _rebuild_tensor_v2, storage_classes
    finally:
        del sys.modules["torch"]
        del sys.modules["torch._utils"]


_NP_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


def write_state_dict_pt(path: str, state: dict, prefix: str = "archive") -> None:
    """Write ``state`` (name → numpy array) as a torch-zip ``.pt`` file
    byte-layout-compatible with ``torch.load`` AND ``load_state_dict``."""
    # ascontiguousarray promotes 0-d → 1-d; keep scalars 0-d like torch does
    arrays = [
        (k, np.ascontiguousarray(v) if np.ndim(v) else np.asarray(v))
        for k, v in state.items()
    ]
    with _torch_shim_modules() as (rebuild, storage_classes):

        class _Tensor:
            def __init__(self, key: int, arr: np.ndarray):
                self.key, self.arr = key, arr

            def __reduce_ex__(self, protocol):
                arr = self.arr
                # contiguous row-major strides in elements
                stride, acc = [], 1
                for dim in reversed(arr.shape):
                    stride.insert(0, acc)
                    acc *= dim
                return (
                    rebuild,
                    (
                        _Storage(self.key, arr),
                        0,
                        tuple(arr.shape),
                        tuple(stride),
                        False,
                        OrderedDict(),
                    ),
                )

        class _Storage:
            def __init__(self, key: int, arr: np.ndarray):
                self.key, self.arr = key, arr

        class _Pickler(pickle.Pickler):
            def persistent_id(self, obj):
                if isinstance(obj, _Storage):
                    sname = _NP_TO_STORAGE[obj.arr.dtype]
                    return (
                        "storage",
                        storage_classes[sname],
                        str(obj.key),
                        "cpu",
                        int(obj.arr.size),
                    )
                return None

        payload = OrderedDict(
            (k, _Tensor(i, a)) for i, (k, a) in enumerate(arrays)
        )
        import io

        buf = io.BytesIO()
        _Pickler(buf, protocol=2).dump(payload)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{prefix}/data.pkl", buf.getvalue())
        for i, (_, a) in enumerate(arrays):
            zf.writestr(f"{prefix}/data/{i}", a.tobytes())
        zf.writestr(f"{prefix}/version", "3\n")
        zf.writestr(f"{prefix}/byteorder", "little")


# ---------------------------------------------------------------------------
# reference parameter-name mapping → SequenceModel
# ---------------------------------------------------------------------------


def _lstm_dir(sd: dict, prefix: str, suffix: str = ""):
    w_ih = sd[f"{prefix}.weight_ih_l0{suffix}"]
    w_hh = sd[f"{prefix}.weight_hh_l0{suffix}"]
    b = sd[f"{prefix}.bias_ih_l0{suffix}"] + sd[f"{prefix}.bias_hh_l0{suffix}"]
    return (
        np.ascontiguousarray(w_ih, dtype=np.float32),
        np.ascontiguousarray(w_hh, dtype=np.float32),
        np.ascontiguousarray(b, dtype=np.float32),
    )


def _bn(sd: dict, prefix: str):
    if f"{prefix}.weight" not in sd:
        return None
    return (
        np.ascontiguousarray(sd[f"{prefix}.weight"], dtype=np.float32),
        np.ascontiguousarray(sd[f"{prefix}.bias"], dtype=np.float32),
        np.ascontiguousarray(sd[f"{prefix}.running_mean"], dtype=np.float32),
        np.ascontiguousarray(sd[f"{prefix}.running_var"], dtype=np.float32),
        BN_EPS_DEFAULT,
    )  # num_batches_tracked: training bookkeeping, ignored at inference


def state_dict_to_model(sd: dict, name: str = "imported") -> SequenceModel:
    """Reference state_dict (DATEXISModel / StackedBiLSTMModel / BioNERModel
    — identical naming scheme, datexis_model.py + bioner_model.py) →
    inference SequenceModel."""
    required = ("ff1.weight", "ff1.bias", "hidden2tag.weight", "hidden2tag.bias",
                "biLSTM.weight_ih_l0", "encoderLSTM.weight_ih_l0")
    missing = [k for k in required if k not in sd]
    if missing:
        raise TorchImportError(f"state_dict missing reference keys: {missing}")

    bilstms = [(_lstm_dir(sd, "biLSTM"), _lstm_dir(sd, "biLSTM", "_reverse"))]
    bns = [_bn(sd, "biLSTMBatchNorms.0")]
    i = 0
    while f"additional_biLSTM_layers.{i}.weight_ih_l0" in sd:
        p = f"additional_biLSTM_layers.{i}"
        bilstms.append((_lstm_dir(sd, p), _lstm_dir(sd, p, "_reverse")))
        bns.append(_bn(sd, f"biLSTMBatchNorms.{i + 1}"))
        i += 1
    enc = _lstm_dir(sd, "encoderLSTM")
    has_bn = any(b is not None for b in bns)
    return SequenceModel(
        ff_w=np.ascontiguousarray(sd["ff1.weight"], dtype=np.float32),
        ff_b=np.ascontiguousarray(sd["ff1.bias"], dtype=np.float32),
        bilstms=bilstms,
        enc_w_ih=enc[0], enc_w_hh=enc[1], enc_b=enc[2],
        out_w=np.ascontiguousarray(sd["hidden2tag.weight"], dtype=np.float32),
        out_b=np.ascontiguousarray(sd["hidden2tag.bias"], dtype=np.float32),
        name=name,
        ff_bn=_bn(sd, "ffBatchNorm"),
        bilstm_bns=bns if has_bn else None,
        enc_bn=_bn(sd, "encoderLSTMBatchNorm"),
    )


def load_sequence_model(path: str, name: str | None = None) -> SequenceModel:
    """One-call import: reference ``.pt`` checkpoint → runnable numpy model."""
    import os

    return state_dict_to_model(
        load_state_dict(path), name=name or os.path.basename(path)
    )


def model_to_state_dict(model: SequenceModel) -> "OrderedDict[str, np.ndarray]":
    """SequenceModel → reference-named state_dict (torch bias convention:
    the kernel's single bias is emitted as bias_ih, with bias_hh zero —
    b_ih + b_hh reproduces it exactly on import). Used by fixture
    generation and round-trip tests."""
    sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
    sd["ff1.weight"] = model.ff_w
    sd["ff1.bias"] = model.ff_b

    def put_lstm(prefix: str, params, suffix: str = ""):
        w_ih, w_hh, b = params
        sd[f"{prefix}.weight_ih_l0{suffix}"] = w_ih
        sd[f"{prefix}.weight_hh_l0{suffix}"] = w_hh
        sd[f"{prefix}.bias_ih_l0{suffix}"] = b
        sd[f"{prefix}.bias_hh_l0{suffix}"] = np.zeros_like(b)

    for i, (fwd, bwd) in enumerate(model.bilstms):
        prefix = "biLSTM" if i == 0 else f"additional_biLSTM_layers.{i - 1}"
        put_lstm(prefix, fwd)
        put_lstm(prefix, bwd, "_reverse")
    put_lstm("encoderLSTM", (model.enc_w_ih, model.enc_w_hh, model.enc_b))
    sd["hidden2tag.weight"] = model.out_w
    sd["hidden2tag.bias"] = model.out_b

    def put_bn(prefix: str, bn):
        if bn is None:
            return
        gamma, beta, mean, var, _eps = bn
        sd[f"{prefix}.weight"] = gamma
        sd[f"{prefix}.bias"] = beta
        sd[f"{prefix}.running_mean"] = mean
        sd[f"{prefix}.running_var"] = var
        sd[f"{prefix}.num_batches_tracked"] = np.array(100, dtype=np.int64)

    put_bn("ffBatchNorm", model.ff_bn)
    for i, bn in enumerate(model.bilstm_bns or []):
        put_bn(f"biLSTMBatchNorms.{i}", bn)
    put_bn("encoderLSTMBatchNorm", model.enc_bn)
    return sd
