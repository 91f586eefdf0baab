"""Pure-numpy reader/writer for fastText's native ``.bin`` model format.

The reference distributes its trained PubMed embeddings as fastText ``.bin``
artifacts and loads them with ``fasttext.load_model`` (reference
bioner/model/encoder/fasttext_encoder.py:14-15; artifact naming
``{minn}-{maxn}ngrams...bin`` from bioner/embeddings/fasttext_runner.py:29).
The fasttext library is not in this environment, but the file format is
public and fully documented by the fastText sources
(facebookresearch/fastText: ``src/fasttext.cc`` ``saveModel``/``signModel``,
``src/args.cc`` ``Args::save``, ``src/dictionary.cc`` ``Dictionary::save``,
``src/densematrix.cc`` ``DenseMatrix::save``), so inference-side loading
needs only ``struct`` + numpy:

    int32  magic = 793712314          (FASTTEXT_FILEFORMAT_MAGIC)
    int32  version (<= 12)
    args   12 x int32: dim ws epoch minCount neg wordNgrams loss model
                       bucket minn maxn lrUpdateRate
           1 x float64: t
    dict   int32 size, int32 nwords, int32 nlabels,
           int64 ntokens, int64 pruneidx_size
           size x (NUL-terminated UTF-8 word, int64 count, int8 entry_type)
           max(0, pruneidx_size) x (int32, int32)
    int8   quant flag (0 = dense float input matrix)
    input  DenseMatrix: int64 m (= nwords + bucket), int64 n (= dim),
           m*n float32 row-major
    int8   qout flag
    output DenseMatrix  -- not needed for word vectors; never read

Word-vector semantics on top of the loaded matrix (``FastText::
getWordVector`` + ``Dictionary::getSubwords``): an in-vocab word averages
its OWN row (its dictionary index) together with its char-n-gram rows at
``nwords + fnv1a(ngram) % bucket``; an OOV word averages n-gram rows only;
EOS ("</s>") never gets n-grams. ``FastTextModel`` (fasttext.py) implements
exactly this when constructed with ``vocab``/``nwords``.

The writer exists so tests and fixtures can produce format-true ``.bin``
files from the spec alone (a trained artifact is ~GB-scale and the training
lib is absent); a reader round-trip against the writer plus hand-decoded
header fields in the tests pin the layout.
"""

from __future__ import annotations

import struct

import numpy as np

from bioner_spark.ner.fasttext import FastTextModel

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

# Args enum values (fastText src/args.h): loss_name ns=1 hs=2 softmax=3;
# model_name cbow=1 sg=2 sup=3. The reference trains skipgram with
# negative sampling (fasttext_runner.py:14-27).
LOSS_NS = 1
MODEL_SKIPGRAM = 2

_ARGS_INT_FIELDS = (
    "dim", "ws", "epoch", "min_count", "neg", "word_ngrams",
    "loss", "model", "bucket", "minn", "maxn", "lr_update_rate",
)


class FastTextBinError(ValueError):
    """Raised when a .bin file is malformed or uses an unsupported variant
    (quantized input matrix, pruned vocabulary)."""


class _Cursor:
    """Buffered read cursor. NUL-terminated vocab words are parsed with one
    ``bytes.find`` per word over chunk-sized buffers — the naive one
    ``f.read(1)`` per byte is tens of millions of Python-level calls on a
    real ~2M-word artifact (minutes of pure overhead before the matrix
    even loads). Large exact reads (the GB-scale matrix) bypass the buffer
    and go straight to the file."""

    __slots__ = ("_f", "_buf", "_pos", "_chunk")

    def __init__(self, f, chunk: int = 1 << 20):
        self._f = f
        self._buf = b""
        self._pos = 0
        self._chunk = chunk

    def read_exact(self, n: int) -> "bytes | bytearray":
        avail = len(self._buf) - self._pos
        if avail >= n:
            out = self._buf[self._pos : self._pos + n]
            self._pos += n
            return out
        head = self._buf[self._pos :]
        self._buf = b""
        self._pos = 0
        if not head:
            rest = self._f.read(n)
            if len(rest) != n:
                raise FastTextBinError(
                    f"truncated .bin: wanted {n} bytes, got {len(rest)}"
                )
            return rest
        # Leftover buffered bytes (the vocab loop almost always leaves some
        # before the GB-scale matrix read): drain them into ONE preallocated
        # destination and readinto the remainder. `head + rest` would hold
        # TWO full-size copies transiently — a ~2× peak-memory spike on a
        # multi-GB input matrix. np.frombuffer/struct.unpack both accept the
        # bytearray without copying.
        out = bytearray(n)
        out[:avail] = head
        view, filled = memoryview(out), avail
        while filled < n:
            got = self._f.readinto(view[filled:])
            if not got:
                raise FastTextBinError(
                    f"truncated .bin: wanted {n} bytes, got {filled}"
                )
            filled += got
        return out

    def read_cstr(self) -> str:
        while True:
            nul = self._buf.find(b"\x00", self._pos)
            if nul >= 0:
                out = self._buf[self._pos : nul]
                self._pos = nul + 1
                return out.decode("utf-8")
            more = self._f.read(self._chunk)
            if not more:
                raise FastTextBinError("truncated .bin inside a vocab word")
            self._buf = self._buf[self._pos :] + more
            self._pos = 0


def load_bin(path: str):
    """Load a fastText ``.bin`` into an inference-ready ``FastTextModel``.

    Returns (model, meta) where meta is the parsed args dict (dim, minn,
    maxn, bucket, nwords, ...) for logging / input_dim wiring. Only the
    input matrix is read — the output (context) matrix used for training
    is skipped, halving load I/O for the word-vector use case.
    """
    with open(path, "rb") as fh:
        f = _Cursor(fh)
        magic, version = struct.unpack("<ii", f.read_exact(8))
        if magic != FASTTEXT_MAGIC:
            raise FastTextBinError(
                f"not a fastText .bin (magic {magic} != {FASTTEXT_MAGIC})"
            )
        if version > FASTTEXT_VERSION:
            raise FastTextBinError(f"unsupported .bin version {version}")

        ints = struct.unpack("<12i", f.read_exact(48))
        args = dict(zip(_ARGS_INT_FIELDS, ints))
        (args["t"],) = struct.unpack("<d", f.read_exact(8))

        size, nwords, nlabels = struct.unpack("<3i", f.read_exact(12))
        ntokens, pruneidx_size = struct.unpack("<2q", f.read_exact(16))
        words: list[str] = []
        counts = np.empty(size, dtype=np.int64)
        types = np.empty(size, dtype=np.int8)
        for i in range(size):
            words.append(f.read_cstr())
            counts[i], types[i] = struct.unpack("<qb", f.read_exact(9))
        if pruneidx_size > 0:
            # pruned dictionaries only occur in quantized models; the
            # reference's released embeddings are unquantized skipgram
            raise FastTextBinError("pruned-vocabulary .bin not supported")

        (quant,) = struct.unpack("<b", f.read_exact(1))
        if quant:
            raise FastTextBinError("quantized input matrix not supported")
        m, n = struct.unpack("<2q", f.read_exact(16))
        if m != nwords + args["bucket"]:
            raise FastTextBinError(
                f"input matrix rows {m} != nwords {nwords} + bucket {args['bucket']}"
            )
        if n != args["dim"] or m < 0 or n <= 0:
            # a dim-inconsistent file would otherwise load "fine" and
            # surface later as an opaque shape mismatch when input_dim
            # wiring trusts meta['dim'] over the actual vector width
            raise FastTextBinError(
                f"input matrix cols {n} != header dim {args['dim']}"
            )
        matrix = np.frombuffer(
            f.read_exact(4 * m * n), dtype="<f4", count=m * n
        ).reshape(m, n)
        # output matrix + qout flag intentionally unread

    vocab = {w: i for i, w in enumerate(words[:nwords])}
    meta = dict(args, nwords=nwords, nlabels=nlabels, ntokens=ntokens,
                version=version)
    model = FastTextModel(
        matrix=np.ascontiguousarray(matrix),
        minn=args["minn"],
        maxn=args["maxn"],
        vocab=vocab,
        nwords=nwords,
    )
    return model, meta


def write_bin(
    path: str,
    matrix: np.ndarray,
    words: list[str],
    counts: list[int] | None = None,
    minn: int = 3,
    maxn: int = 4,
    dim: int | None = None,
    ws: int = 10,
    epoch: int = 15,
    min_count: int = 10,
    neg: int = 5,
    t: float = 1e-5,
) -> None:
    """Write a format-true unquantized skipgram ``.bin``.

    ``matrix`` must be [len(words) + bucket, dim]; bucket is inferred.
    The output matrix is written as the [nwords, dim] zero matrix fastText
    would also accept — word-vector inference never reads it. Default args
    mirror the reference training config (fasttext_runner.py:13-27)."""
    nwords = len(words)
    m, mat_dim = matrix.shape
    dim = dim or mat_dim
    if dim != mat_dim:
        raise ValueError(f"dim {dim} != matrix cols {mat_dim}")
    bucket = m - nwords
    if bucket <= 0:
        raise ValueError("matrix must have nwords + bucket rows")
    counts = counts if counts is not None else [max(min_count, 1)] * nwords
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        f.write(
            struct.pack(
                "<12i",
                dim, ws, epoch, min_count, neg, 1,
                LOSS_NS, MODEL_SKIPGRAM, bucket, minn, maxn, 100,
            )
        )
        f.write(struct.pack("<d", t))
        f.write(struct.pack("<3i", nwords, nwords, 0))
        # pruneidx_size = -1 means "dictionary never pruned" in fastText's
        # Dictionary::save; 0 would mean "pruned down to nothing" and makes
        # Dictionary::pushHash drop every subword bucket row on load.
        f.write(struct.pack("<2q", int(sum(counts)), -1))
        for w, c in zip(words, counts):
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", c, 0))
        f.write(struct.pack("<b", 0))  # quant = false
        f.write(struct.pack("<2q", m, dim))
        f.write(np.ascontiguousarray(matrix, dtype="<f4").tobytes())
        f.write(struct.pack("<b", 0))  # qout = false
        out = np.zeros((nwords, dim), dtype="<f4")
        f.write(struct.pack("<2q", nwords, dim))
        f.write(out.tobytes())
