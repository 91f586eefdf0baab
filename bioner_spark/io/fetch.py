"""Model/embedding artifact fetch (S13).

Mirrors the reference's cache-aware download (FastTextEmbedding,
fasttext_encoder.py:31-58): skip when the target file already exists unless
force is set, stream the body in chunks, and use the
`{root}/{ngram_range}-fastText-embeddings.bin` naming scheme
(fasttext_encoder.py:33). Differences, on purpose:

  * stdlib `urllib.request` instead of `requests` (no third-party dep; the
    sandbox has no network, so tests exercise `file://` URLs — the handler
    stack is identical for http/https/file);
  * the download streams into a `.part` sibling and renames into place, so
    a killed driver never leaves a truncated artifact that the exists-check
    would then treat as complete (the reference writes the final path
    directly, fasttext_encoder.py:43);
  * no progress bar (the reference wraps tqdm, :48-55) — callers get a
    bytes-written return instead.

On a cluster the fetched artifact is then shipped to executors via
`SparkContext.addFile` exactly like the trained weights (scripts/kg_job.py
--model), so the fetch happens once on the driver, never per task.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

# Read once at import: os.umask can only READ by writing, which mutates
# process-global state — toggling it per fetch would race concurrent
# fetchers (one could observe umask 0 and chmod an artifact world-writable,
# or leave the process umask permanently 0).
_UMASK = os.umask(0)
os.umask(_UMASK)


def artifact_cache_path(root: str, ngram_range: str) -> str:
    """Naming parity with the reference cache (fasttext_encoder.py:33)."""
    return os.path.join(root, f"{ngram_range}-fastText-embeddings.bin")


def fetch_artifact(
    url: str,
    dest_path: str,
    force: bool = False,
    chunk_size: int = 64 * 1024,
    timeout: float = 60.0,
) -> int:
    """Cache-aware streaming fetch. Returns bytes written (0 = cache hit).

    Raises URLError/HTTPError/FileNotFoundError on unreachable sources —
    the caller decides whether a stale cache is acceptable."""
    if not force and os.path.isfile(dest_path):
        return 0
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    # UNIQUE temp name in the same directory: a fixed '<dest>.part' would
    # let two concurrent fetchers of the same artifact interleave writes
    # into one file and atomically install corrupt bytes (which every later
    # run then treats as a valid cache hit); mkstemp keeps the final
    # os.replace atomic while making the races last-complete-writer-wins
    written = 0
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        # temp file created only once the source is reachable
        fd, part = tempfile.mkstemp(
            prefix=os.path.basename(dest_path) + ".", suffix=".part",
            dir=os.path.dirname(dest_path) or ".",
        )
        try:
            with os.fdopen(fd, "wb") as out:
                while True:
                    chunk = resp.read(chunk_size)
                    if not chunk:
                        break
                    out.write(chunk)
                    written += len(chunk)
            # mkstemp creates 0600 and os.replace preserves it — a shared
            # model-cache dir (one account fetches, others read) would then
            # hit PermissionError forever, because the cache-hit check above
            # sees the file exists and never re-downloads. Restore the
            # umask-honoring mode a plain open() would have produced.
            os.chmod(part, 0o666 & ~_UMASK)
            os.replace(part, dest_path)
        except BaseException:
            # never strand a temp file on a failed/interrupted fetch
            try:
                os.unlink(part)
            except OSError:
                pass
            raise
    return written


def ensure_embeddings(
    root: str, ngram_range: str, url: str, force: bool = False
) -> str:
    """FastTextEmbedding.__init__/download semantics
    (fasttext_encoder.py:31-40): resolve the cache path, fetch if missing
    or forced, return the local path ready for `ner/fasttext_bin.load_bin`."""
    path = artifact_cache_path(root, ngram_range)
    fetch_artifact(url, path, force=force)
    return path
