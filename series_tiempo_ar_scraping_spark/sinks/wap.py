"""Write-Audit-Publish (WAP): the data-lake release pattern for the
engine's sinks (SURVEY §2.2 K1-K5 evolved to the 100 TB publishing
contract).

The reference writes CSVs in place and reports problems afterwards
(generators/base.py writes, then the validation report); at fleet
scale an in-place write that fails its checks has already corrupted
the consumers' view. WAP inverts the order:

1. WRITE the full output to a staging directory nobody reads.
2. AUDIT the staged files themselves (read-back, not the input frame:
   the audit must see exactly the bytes consumers would).
3. PUBLISH by atomic directory rename — consumers see the old version
   or the new version, never a half-written one — or ABORT, deleting
   staging and leaving the published version untouched.

A manifest (`_WAP_MANIFEST.json`) travels inside the published
directory: row count, audit names, and the publishing generation —
the provenance record a downstream job can assert against.
"""

from __future__ import annotations

import errno
import itertools
import json
import os
import re
import shutil
from typing import Callable, Optional

from pyspark.sql import DataFrame

MANIFEST = "_WAP_MANIFEST.json"

# an audit takes the STAGED read-back frame and returns None (pass) or
# a failure message
Audit = Callable[[DataFrame], Optional[str]]


def non_empty_audit(df: DataFrame) -> Optional[str]:
    """The minimum useful audit: refuse to publish an empty output."""
    return None if df.limit(1).count() == 1 else "output is empty"


def no_null_audit(*cols: str) -> Audit:
    """Audit factory: refuse to publish if any named column has NULLs."""

    def audit(df: DataFrame) -> Optional[str]:
        from pyspark.sql import functions as F

        bad = [
            c
            for c in cols
            if df.filter(F.col(c).isNull()).limit(1).count() > 0
        ]
        return f"null values in {bad}" if bad else None

    return audit


def write_audit_publish(
    df: DataFrame,
    publish_dir: str,
    audits: list,
    fmt: str = "parquet",
    symlink_publish: bool = True,
) -> dict:
    """Run the WAP cycle for one output. Returns a result dict:
    ``{"published": bool, "rows": int, "failures": [...],
    "generation": int}``.

    Default mode is ``symlink_publish=True`` (pointer-swap): it has no
    ENOENT window at all. On a filesystem without symlink support the
    default degrades to the two-rename mode automatically (probed
    before any data is written); ``symlink_publish=False`` forces the
    rename mode.

    Atomicity (rename mode): the publish step is two POSIX renames
    (current → retired, staging → current) — each individually
    atomic, and a reader holding the old path keeps its open file
    handles. Between the two renames there is a brief window where
    ``publish_dir`` does not exist (a new reader gets ENOENT rather
    than "old or new"); crash recovery closes it on the next run: if
    the process died inside that window, ``publish_dir`` is absent
    and ``retired`` holds the only good copy, so entry RESTORES
    retired → publish_dir before doing anything else — ``retired`` is
    only ever deleted while ``publish_dir`` exists. A failed audit
    deletes staging and leaves the CURRENT PUBLICATION EXACTLY AS IT
    WAS — the property the reference's write-then-validate order
    cannot give. Generations increment across publishes so consumers
    can pin or diff releases.

    ``symlink_publish=True`` removes even the ENOENT window:
    ``publish_dir`` becomes a SYMLINK to a versioned directory
    (``<publish_dir>.gen<N>``) and each publish is a single atomic
    ``rename(templink, publish_dir)`` symlink swap — a new reader sees
    the old version or the new one at every instant, with no
    in-between state at all (the Iceberg/Delta pointer-swap idea
    expressed in plain POSIX). Old generation directories are removed
    after the swap; a crash at any point leaves the link pointing at
    a complete version. The two modes interoperate per directory only
    in the forward direction (a dir-mode publication is upgraded to
    link-mode on the next symlink publish)."""
    if symlink_publish and _symlinks_supported(publish_dir):
        return _write_audit_publish_symlink(
            df, publish_dir, audits, fmt
        )
    spark = df.sparkSession

    def _remove_retired(path: str) -> None:
        # the retired slot can hold a SYMLINK when this store was last
        # published in link mode (downgrade path — e.g. the symlink
        # support probe failing on a previously-link-mode store):
        # rmtree refuses symlinks, so unlink the pointer and remove
        # the generation dir it referenced
        if os.path.islink(path):
            target = os.path.join(
                os.path.dirname(path) or ".", os.readlink(path)
            )
            os.unlink(path)
            if os.path.isdir(target):
                shutil.rmtree(target, ignore_errors=True)
        elif os.path.lexists(path):
            shutil.rmtree(path)

    staging = publish_dir.rstrip("/") + ".staging"
    retired = publish_dir.rstrip("/") + ".retired"
    # Crash recovery: a death between the two publish renames leaves
    # publish_dir missing and retired holding the last good
    # publication. Roll it back rather than treating it as leftover.
    if os.path.lexists(retired) and not os.path.lexists(publish_dir):
        os.rename(retired, publish_dir)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.lexists(retired) and os.path.lexists(publish_dir):
        _remove_retired(retired)
    df.write.mode("overwrite").format(fmt).save(staging)

    back = spark.read.format(fmt).load(staging)
    failures = []
    for audit in audits:
        msg = audit(back)
        if msg is not None:
            failures.append(msg)
    if failures:
        shutil.rmtree(staging)
        return {
            "published": False,
            "rows": 0,
            "failures": failures,
            "generation": _generation(publish_dir),
        }

    rows = back.count()
    gen = _generation(publish_dir) + 1
    with open(os.path.join(staging, MANIFEST), "w") as fh:
        json.dump(
            {
                "rows": rows,
                "audits": [
                    getattr(a, "__name__", "audit") for a in audits
                ],
                "generation": gen,
                "format": fmt,
            },
            fh,
        )
    if os.path.lexists(publish_dir):
        os.rename(publish_dir, retired)
    os.rename(staging, publish_dir)
    if os.path.lexists(retired):
        _remove_retired(retired)
    return {
        "published": True,
        "rows": rows,
        "failures": [],
        "generation": gen,
    }


# Memoized probe results keyed by (device, inode) of the parent dir —
# symlink support is a filesystem property, so one probe per mounted
# parent suffices; path-keying would re-probe bind-mount aliases but
# never give a wrong answer, inode-keying avoids even that. Exposed
# (not name-mangled) so tests that monkeypatch os.symlink can clear it.
_SYMLINK_SUPPORT_CACHE: dict = {}
_PROBE_SEQ = itertools.count()


def _symlinks_supported(publish_dir: str) -> bool:
    """Probe (memoized per parent filesystem) whether the target can
    hold symlinks — some object-store mounts and SMB/FAT volumes
    cannot. Probing BEFORE any data is written lets the symlink
    default degrade to the two-rename mode up front, instead of
    failing mid-publish with a complete-but-unreachable generation
    directory.

    Only ``OSError``s that plausibly mean "this filesystem cannot hold
    a symlink" (EPERM/ENOTSUP/EOPNOTSUPP/EINVAL — what FAT, SMB and
    unprivileged-Windows mounts actually raise) are CACHED as
    unsupported; any other errno (ENOSPC, transient EACCES, ...) makes
    only THIS call degrade to two-rename mode, uncached, so one
    transient error cannot permanently downgrade every later publish
    in the process. The probe name is unique per call (pid +
    process-wide counter), so ``FileExistsError`` can only arise from
    a crashed prior run's residue colliding on (pid, seq); that gets
    ONE bounded retry with a fresh name, then reads indeterminate
    (False, uncached) — never unbounded recursion. A missing parent
    (first publish into a new tree) is created rather than misread as
    ENOTSUP — any misreading here would silently degrade a publish to
    the two-rename mode and reintroduce the ENOENT window the symlink
    default exists to remove."""
    parent = os.path.dirname(publish_dir.rstrip("/")) or "."
    # ENOENT on the parent is "not created yet", not "unsupported"
    os.makedirs(parent, exist_ok=True)
    st = os.stat(parent)
    cache_key = (st.st_dev, st.st_ino)
    cached = _SYMLINK_SUPPORT_CACHE.get(cache_key)
    if cached is not None:
        return cached
    # errnos that genuinely signal "this filesystem cannot hold a
    # symlink" (the only ones worth caching per-filesystem)
    unsupported_errnos = {
        errno.EPERM,
        errno.ENOTSUP,
        getattr(errno, "EOPNOTSUPP", errno.ENOTSUP),
        errno.EINVAL,
    }
    for _ in range(2):  # one retry on residue collision, bounded
        probe = os.path.join(
            parent,
            f".wap_symlink_probe_{os.getpid()}_{next(_PROBE_SEQ)}",
        )
        try:
            os.symlink("x", probe)
        except FileExistsError:
            continue  # crashed-run residue; retry once with fresh name
        except OSError as exc:
            if exc.errno in unsupported_errnos:
                _SYMLINK_SUPPORT_CACHE[cache_key] = False
            # transient (ENOSPC, momentary EACCES, ...): degrade this
            # call only — do NOT poison the per-filesystem cache
            return False
        try:
            os.unlink(probe)
        except OSError:
            pass  # cleanup is best-effort; support itself is proven
        _SYMLINK_SUPPORT_CACHE[cache_key] = True
        return True
    # two residue collisions in a row: indeterminate, uncached
    return False


def _write_audit_publish_symlink(
    df: DataFrame, publish_dir: str, audits: list, fmt: str
) -> dict:
    """Pointer-swap WAP: write to a fresh versioned dir, audit the
    read-back, then atomically repoint the ``publish_dir`` symlink.

    Crash safety by construction: the versioned dir is complete before
    the link ever points at it, the swap is one atomic rename, and
    cleanup of superseded generations happens only after the swap —
    at every instant the link resolves to a complete publication (or,
    before the first publish, does not exist). Leftover unreferenced
    ``.gen*`` dirs from a crashed run are swept on entry."""
    spark = df.sparkSession
    base = publish_dir.rstrip("/")
    # crash recovery: a death between the legacy-dir move-aside and
    # the first symlink swap leaves base missing and .legacy holding
    # the only good copy — restore it before anything else
    if not os.path.lexists(base) and os.path.isdir(base + ".legacy"):
        os.rename(base + ".legacy", base)
    # a death between the swap and the legacy rmtree leaves a stale
    # .legacy next to a live base; clear it or the next upgrade
    # publish would rename onto a non-empty dir and fail
    elif os.path.lexists(base) and os.path.lexists(base + ".legacy"):
        shutil.rmtree(base + ".legacy", ignore_errors=True)
    # upgrade path: a real directory from the rename-mode publisher
    # becomes generation N content behind the link
    prior_gen = _generation(base)
    current_target = (
        os.readlink(base) if os.path.islink(base) else None
    )
    # sweep unreferenced generation dirs from crashed runs
    parent = os.path.dirname(base) or "."
    prefix = os.path.basename(base) + ".gen"
    gen_pat = re.compile(re.escape(prefix) + r"\d+")
    for entry in os.listdir(parent):
        # anchor to the exact versioned-dir shape: a sibling named
        # e.g. "<base>.gen_backup" or "<base>.general" is NOT ours
        if not gen_pat.fullmatch(entry):
            continue
        full = os.path.join(parent, entry)
        if current_target and os.path.basename(
            current_target
        ) == entry:
            continue
        shutil.rmtree(full, ignore_errors=True)

    gen = prior_gen + 1
    target = f"{base}.gen{gen}"
    df.write.mode("overwrite").format(fmt).save(target)
    back = spark.read.format(fmt).load(target)
    failures = [m for m in (a(back) for a in audits) if m is not None]
    if failures:
        shutil.rmtree(target)
        return {
            "published": False,
            "rows": 0,
            "failures": failures,
            "generation": prior_gen,
        }
    rows = back.count()
    with open(os.path.join(target, MANIFEST), "w") as fh:
        json.dump(
            {
                "rows": rows,
                "audits": [
                    getattr(a, "__name__", "audit") for a in audits
                ],
                "generation": gen,
                "format": fmt,
            },
            fh,
        )
    # atomic pointer swap: symlink to a temp name, rename over the
    # link (rename replaces an existing symlink atomically). A real
    # directory at publish_dir (rename-mode legacy) is moved aside
    # first and cleaned after the swap.
    legacy = None
    if os.path.exists(base) and not os.path.islink(base):
        legacy = base + ".legacy"
        os.rename(base, legacy)
    tmp_link = f"{base}.lnk.tmp"
    if os.path.lexists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(os.path.basename(target), tmp_link)
    os.rename(tmp_link, base)
    if legacy:
        shutil.rmtree(legacy, ignore_errors=True)
    if current_target:
        shutil.rmtree(
            os.path.join(parent, os.path.basename(current_target)),
            ignore_errors=True,
        )
    return {
        "published": True,
        "rows": rows,
        "failures": [],
        "generation": gen,
    }


def _generation(publish_dir: str) -> int:
    path = os.path.join(publish_dir, MANIFEST)
    if not os.path.exists(path):
        return 0
    try:
        with open(path) as fh:
            return int(json.load(fh).get("generation", 0))
    except (ValueError, OSError):
        return 0
