"""Process-scoped scratch-dir registry for staged datasets.

Several queries stage data on local disk before the engine touches it
(CDC change dirs, streaming replays, bucketed-table and round-trip
writes, persisted ANN / dedup indexes). Before this module each call
site ran ``tempfile.mkdtemp`` directly and never removed the result, so
a bench or correctness loop that evaluates the registry repeatedly
accumulated full dataset copies in /tmp for the life of the machine,
not the process.

``scratch_dir`` keeps the per-call isolation (every call returns a
fresh unique dir — staged inputs are never shared between query
evaluations, so two evaluations can never race on one dir) but parents
everything under ONE per-process root that is removed at interpreter
exit. Spark evaluation is lazy, but every staged dir is consumed within
the process that staged it, so exit-time removal is always safe.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh unique scratch directory, removed at process exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="klw_staging_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
