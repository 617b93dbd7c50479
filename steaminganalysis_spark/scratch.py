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


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


def scratch_dir(tag: str) -> str:
    """A fresh directory under the tag, wiping THIS PROCESS's previous
    invocations first. The root is scoped per pid so concurrent
    processes (parallel sweeps, xdist workers) can never delete each
    other's live scratch files; roots left by dead pids are pruned
    best-effort."""
    me = os.getpid()
    root = os.path.join(_PARENT, f"{tag}-pid{me}")
    shutil.rmtree(root, ignore_errors=True)
    # prune siblings whose owner process is gone
    try:
        for entry in os.listdir(_PARENT):
            if entry.startswith(f"{tag}-pid") and entry != f"{tag}-pid{me}":
                try:
                    pid = int(entry.rsplit("pid", 1)[1])
                except ValueError:
                    continue
                if not _pid_alive(pid):
                    shutil.rmtree(os.path.join(_PARENT, entry), ignore_errors=True)
    except FileNotFoundError:
        pass
    d = os.path.join(root, uuid.uuid4().hex[:12])
    os.makedirs(d, exist_ok=True)
    return d
