"""Exhaustive crash-point enumeration for the WAP publish state
machine (r11).

The r10/r11 ADVICE items against wap.py were all crash-window bugs
found by hand (retired-dir deletion, stale .legacy leak, sweep
overreach). This test finds that whole class mechanically: it wraps
every MUTATING filesystem call the publisher makes (rename, symlink,
unlink, rmtree) and re-runs a publish crashing at the 1st, 2nd, ...
Nth mutation. After every injected crash it asserts the two contracts
the docstrings claim:

- SYMLINK MODE, the marquee no-ENOENT property: once a first
  publication exists, a reader finds a COMPLETE publication (old or
  new, never missing, never torn) at EVERY crash point.
- RENAME MODE: the only reader-visible gap is the documented
  between-the-two-renames ENOENT window, and entry recovery restores
  the publication on the next run.

Then a recovery publish must succeed and converge to the new data with
no staging/retired/legacy/orphan-generation residue.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

import series_tiempo_ar_scraping_spark.sinks.wap as W
from series_tiempo_ar_scraping_spark.sinks.wap import (
    non_empty_audit,
    write_audit_publish,
)


from tests.crashlib import (  # noqa: E402
    InjectedCrash as _InjectedCrash,
    Injector,
    count_mutations,
)


def _count_mutations(monkeypatch_factory, publish, *args) -> int:
    """Dry-count the mutating calls of one publish (no injection)."""
    return count_mutations(
        monkeypatch_factory, W, lambda: publish(*args)
    )


def _readable_count(spark, pub: str) -> int | None:
    """What a concurrent reader sees: row count of a COMPLETE
    publication, or None if the path is absent. A torn read raises."""
    if not os.path.lexists(pub):
        return None
    return spark.read.parquet(pub).count()


@pytest.mark.parametrize("symlink_mode", [True, False])
def test_every_crash_point_leaves_a_recoverable_store(
    spark, tmp_path, monkeypatch, symlink_mode
):
    from _pytest.monkeypatch import MonkeyPatch

    base_dir = str(tmp_path)
    df_old = spark.range(5).select(F.col("id"))
    df_new = spark.range(9).select(F.col("id"))

    def publish(pub, df):
        return write_audit_publish(
            df, pub, [non_empty_audit], symlink_publish=symlink_mode
        )

    # count the second publish's mutations once, on a pristine store
    probe_pub = os.path.join(base_dir, "probe")
    assert publish(probe_pub, df_old)["published"]
    n_mut = _count_mutations(MonkeyPatch, publish, probe_pub, df_new)
    assert n_mut >= 2  # sanity: the machine mutates more than once

    enoent_windows = 0
    for crash_at in range(1, n_mut + 1):
        pub = os.path.join(base_dir, f"pub{symlink_mode}{crash_at}")
        assert publish(pub, df_old)["published"]
        mp = MonkeyPatch()
        Injector(mp, W, crash_at=crash_at)
        with pytest.raises(_InjectedCrash):
            publish(pub, df_new)
        mp.undo()

        seen = _readable_count(spark, pub)
        if symlink_mode:
            # the marquee claim: NO crash point hides the publication
            assert seen in (5, 9), (crash_at, seen)
        else:
            # rename mode: only the documented ENOENT window may hide
            # it; count the windows and check recovery below
            assert seen in (5, 9, None), (crash_at, seen)
            if seen is None:
                enoent_windows += 1

        # recovery: the next publish converges to the new data...
        r = publish(pub, df_new)
        assert r["published"], crash_at
        assert _readable_count(spark, pub) == 9, crash_at
        # ...and leaves no residue of any kind
        parent = os.path.dirname(pub)
        name = os.path.basename(pub)
        residue = [
            e
            for e in os.listdir(parent)
            if e.startswith(name + ".")
            and not (symlink_mode and _is_live_gen(pub, e))
        ]
        assert residue == [], (crash_at, residue)

    if not symlink_mode:
        # the two-rename design has EXACTLY one ENOENT window; more
        # would mean a new unreadable state crept in
        assert enoent_windows <= 1, enoent_windows


def _is_live_gen(pub: str, entry: str) -> bool:
    """In link mode the one referenced generation dir is not residue."""
    if not os.path.islink(pub):
        return False
    return entry == os.path.basename(os.readlink(pub))
