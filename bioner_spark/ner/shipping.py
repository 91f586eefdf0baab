"""Ship a model artifact to executors via SparkContext.addFile.

One implementation of the ship-an-npz pattern shared by `infer.ship_model`
(NER weights) and `fasttext.ship_fasttext` (embedding matrices) — the two
copies previously had to keep two subtle rules in sync by hand:

* the default name is UNIQUE per call: addFile silently ignores a
  re-registration under an existing filename AND warm Python workers cache
  loaded weights by name, so shipping retrained weights under a reused name
  would silently keep serving the old ones;
* the source file must OUTLIVE the app: local-mode executors re-validate
  fetched files against the original path per task (deleting it fails jobs
  with 'does not match contents of file:...'), so cleanup happens at
  interpreter exit, not immediately.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
import uuid
from typing import Callable

from pyspark.sql import SparkSession

# (applicationId, shipped name) pairs — ENFORCES the ship-once rule the
# module docstring states: addFile silently ignores a re-registration and
# warm workers cache by name, so a reused explicit name would silently
# serve STALE weights; raising here turns that into a loud error. Keyed by
# app id so a fresh SparkContext (new executors, empty caches) may reuse
# names.
_SHIPPED: set[tuple[str, str]] = set()

# guards the reserve/rollback of _SHIPPED: multi-threaded job submission is
# a normal Spark driver pattern, and an unlocked check-then-act spanning the
# whole save+addFile would let two concurrent ships of the same name both
# pass the duplicate check — the second addFile is silently ignored and warm
# workers serve the FIRST artifact under the second caller's name
_SHIP_LOCK = threading.Lock()


def ship_npz(
    spark: SparkSession,
    save_fn: Callable[[str], None],
    name: str | None,
    default_prefix: str,
) -> str:
    """Save via `save_fn(path)` into a fresh temp dir, addFile it, return
    the SparkFiles name. Pass an explicit `name` only if you ship that name
    once per application (enforced — see module docstring for why)."""
    if name is None:
        name = f"{default_prefix}_{uuid.uuid4().hex[:12]}"
    key = (spark.sparkContext.applicationId, name)
    # reserve the key NOW, under the lock — checking here but registering
    # only after save+addFile would leave the whole (slow) save as a window
    # in which a concurrent ship of the same name passes the check too;
    # rollback on failure below preserves retry-after-failed-save
    with _SHIP_LOCK:
        if key in _SHIPPED:
            raise ValueError(
                f"ship_npz: name {name!r} was already shipped in this "
                "application — addFile would silently ignore the re-ship and "
                "warm workers would keep serving the OLD weights; use a fresh "
                "name (or the unique default) per artifact version"
            )
        _SHIPPED.add(key)
    fname = f"{name}.npz"
    # EVERYTHING fallible sits inside the try so the reservation rolls back
    # on any failure: mkdtemp itself can raise (ENOSPC — the same disk-full
    # case the retry rule exists for), and outside the try it would burn
    # the name forever with nothing shipped
    try:
        d = tempfile.mkdtemp(prefix="bioner_ship_")
        # cleanup registered BEFORE save/addFile can fail, or a failed
        # save_fn leaks one orphan dir per retry attempt; the dir must
        # outlive the app either way because local-mode executors
        # re-validate addFile sources per task, and atexit ordering is
        # safe for an ignore_errors rmtree
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        path = os.path.join(d, fname)
        save_fn(path)
        spark.sparkContext.addFile(path)
    except BaseException:
        # a failed ship never reached any worker cache, so retrying the
        # same name is safe and must not be burned by the once-per-app rule
        with _SHIP_LOCK:
            _SHIPPED.discard(key)
        raise
    return fname
