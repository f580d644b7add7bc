"""Atomic single-file publish: the unique-temp + ``os.replace``
contract shared by every small-file writer (downloaded payloads S2,
data.json K2, catalog/report xlsx K3/K4, report CSV K5).

The reference writes every output in place (``base.py:494-504,679-703``
open the published path directly); a crash mid-write leaves a
truncated JSON/zip/CSV at the path consumers read. Here the content is
staged to a same-directory temp whose name embeds pid + a process-wide
counter (concurrent writers of one target — task retry, Spark
speculative execution — never interleave into one temp; last complete
``os.replace`` wins), so readers of the published path see the OLD
complete file or the NEW complete file, never a partial one. The same
invariant the WAP sink provides for directory-shaped outputs
(``sinks/wap.py``), stated once for file-shaped ones.

Crash windows (enumerated in ``tests/test_atomic_writers_crash.py``):
a death while staging leaves only a ``.part.*`` temp — INERT, because
readers address the exact target path, never globs — and the target
untouched; a death at the replace boundary is resolved by the kernel
(rename atomicity): old or new, never between. Orphaned temps from a
hard kill are deliberately not swept here: a sweep could unlink the
live temp of a concurrent speculative writer and fail its replace
(the same policy, for the same reason, as
``sources/landing._atomic_write``). On a SOFT failure (exception
propagating through the context manager) the writer's own temp — a
name no other writer can hold — is removed, so retried jobs do not
accumulate residue.
"""

from __future__ import annotations

import itertools
import os
from contextlib import contextmanager

_SEQ = itertools.count()


@contextmanager
def atomic_output_path(path: str):
    """Yield a unique same-directory temp path; on clean exit, publish
    it to ``path`` with one atomic ``os.replace``. On exception, unlink
    the temp (ours alone — the name is per-call unique) and re-raise
    with the target untouched."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.part.{os.getpid()}.{next(_SEQ)}"
    try:
        yield tmp
        # inside the try: a soft failure OF THE REPLACE ITSELF (EPERM,
        # EXDEV, ...) must also clean the temp — the first run of the
        # crash enumeration caught exactly this window
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
