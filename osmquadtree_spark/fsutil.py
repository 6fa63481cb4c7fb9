"""Shared directory-swap primitive for locally-materialized artifacts.

The qts store and the soundness-oracle candidate exports both publish a
directory of parquet files via write-to-tmp + swap. The swap must never
leave the destination as a HALF-DELETED directory (a reader that lists
mid-rmtree sees a torn table), so the stale directory is renamed ASIDE
first — both renames are atomic on one filesystem — and deleted under its
aside name. One definition here instead of two divergent copies (an r4
review finding: the store had gained the safe swap while the export path
kept the rmtree-then-rename window).

On an object store (S3/HDFS) this local-rename pattern does not apply;
production sinks there are the Iceberg atomic-snapshot commits described
in operators/sortblocks.py — this helper is the local-scratch twin.
"""

from __future__ import annotations

import os
import shutil
import uuid


def swap_dir(tmp: str, path: str) -> None:
    """Atomically replace directory ``path`` with ``tmp``.

    ``path`` is never observable as a partially-deleted tree: a stale
    directory is first renamed aside (tolerating a concurrent swapper
    having already moved it), then removed under the aside name. The
    final ``os.rename(tmp, path)`` raises ``OSError`` if a concurrent
    writer re-created ``path`` in the gap — callers that know the content
    is a deterministic function of the inputs may accept the winner's
    copy (both builders derive identical tables); others should re-raise.
    """
    if os.path.isdir(path):
        aside = path + ".old-" + uuid.uuid4().hex[:8]
        try:
            os.rename(path, aside)
        except FileNotFoundError:
            pass  # a concurrent swapper moved it aside first
        else:
            shutil.rmtree(aside, ignore_errors=True)
    os.rename(tmp, path)
