"""Process-scoped temp directories with atexit cleanup.

Streaming lots, materialized dedup-pair lots, and streaming
checkpoints all need scratch directories that live for the rest of the
process (several queries share them) but must not leak across process
exits — a long-lived driver calling the engine repeatedly would
otherwise accumulate ``/tmp/lq_*`` trees.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []
_REGISTERED = False


def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)


def session_tmpdir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit."""
    global _REGISTERED
    if not _REGISTERED:
        atexit.register(_cleanup)
        _REGISTERED = True
    path = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(path)
    return path
