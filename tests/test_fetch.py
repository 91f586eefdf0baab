"""S13 artifact fetch: cache semantics + streaming via file:// URLs
(no network in the sandbox; urllib's handler stack is shared with http)."""

from __future__ import annotations

import os
import pathlib
import urllib.error

import pytest

from bioner_spark.io.fetch import artifact_cache_path, ensure_embeddings, fetch_artifact


@pytest.fixture
def source(tmp_path):
    src = tmp_path / "weights.bin"
    src.write_bytes(b"\x01\x02" * 50000)  # 100 KB, forces multiple chunks
    return src


def _url(p: pathlib.Path) -> str:
    return p.resolve().as_uri()


def test_fetch_streams_and_caches(source, tmp_path):
    dest = tmp_path / "cache" / "model.bin"
    n = fetch_artifact(_url(source), str(dest), chunk_size=1024)
    assert n == 100000
    assert dest.read_bytes() == source.read_bytes()
    assert not os.path.exists(str(dest) + ".part")
    # cache hit: nothing re-read (reference skip, fasttext_encoder.py:38)
    assert fetch_artifact(_url(source), str(dest)) == 0
    # force re-fetches (force_download flag, :32, :38)
    assert fetch_artifact(_url(source), str(dest), force=True) == 100000


def test_failed_fetch_leaves_no_artifact(source, tmp_path):
    dest = tmp_path / "model.bin"
    with pytest.raises((urllib.error.URLError, FileNotFoundError)):
        fetch_artifact(_url(tmp_path / "missing.bin"), str(dest))
    # neither the final path nor a stranded temp file may exist
    assert not dest.exists()
    assert [p.name for p in tmp_path.iterdir() if ".part" in p.name] == []


def test_ensure_embeddings_naming(source, tmp_path):
    root = tmp_path / "emb"
    path = ensure_embeddings(str(root), "3;6", _url(source))
    assert path == artifact_cache_path(str(root), "3;6")
    assert path.endswith("3;6-fastText-embeddings.bin")
    assert os.path.getsize(path) == 100000
    # second call is a cache hit (same path returned, file untouched)
    before = os.path.getmtime(path)
    assert ensure_embeddings(str(root), "3;6", _url(source)) == path
    assert os.path.getmtime(path) == before
