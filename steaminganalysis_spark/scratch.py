"""Per-invocation scratch directories that do not accumulate.

Queries that must materialize fixture files (binaryFile scans, the
streaming near-dup state) allocate scratch space here: each call wipes
the PREVIOUS invocations' dirs for the same tag before creating a new
one, so repeated sweeps (oracle runs, bench, the grading driver) leave
at most one live dir per tag instead of leaking one per call. The
returned DataFrames read their files lazily, so cleanup happens at the
NEXT invocation, after any prior result has been consumed.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

_PARENT = os.path.join(tempfile.gettempdir(), "sa_spark_scratch")


def scratch_dir(tag: str) -> str:
    """A fresh directory under the tag, wiping the tag's previous
    invocations first."""
    root = os.path.join(_PARENT, tag)
    shutil.rmtree(root, ignore_errors=True)
    d = os.path.join(root, uuid.uuid4().hex[:12])
    os.makedirs(d, exist_ok=True)
    return d
