"""Write-Audit-Publish sink: the atomic-release contract, driven."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.sinks.wap import (
    MANIFEST,
    no_null_audit,
    non_empty_audit,
    write_audit_publish,
)


def test_wap_publishes_good_output(spark, tmp_path):
    pub = str(tmp_path / "pub")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    r = write_audit_publish(df, pub, [non_empty_audit])
    assert r["published"] and r["rows"] == 10 and r["generation"] == 1
    # default mode is now the pointer-swap (no ENOENT window)
    assert os.path.islink(pub)
    back = spark.read.parquet(pub)
    assert back.count() == 10
    with open(os.path.join(pub, MANIFEST)) as fh:
        m = json.load(fh)
    assert m["rows"] == 10 and m["generation"] == 1
    # no staging/retired residue
    assert not os.path.exists(pub + ".staging")
    assert not os.path.exists(pub + ".retired")


def test_wap_failed_audit_preserves_current_publication(spark, tmp_path):
    """THE property: a failed audit must leave the live publication
    byte-for-byte as it was — the reference's write-then-validate
    order cannot give this."""
    pub = str(tmp_path / "pub")
    good = spark.range(5).select(
        F.col("id"), F.lit("x").alias("tag")
    )
    assert write_audit_publish(good, pub, [non_empty_audit])["published"]
    bad = spark.range(3).select(
        F.col("id"), F.lit(None).cast("string").alias("tag")
    )
    r = write_audit_publish(
        bad, pub, [non_empty_audit, no_null_audit("tag")]
    )
    assert not r["published"]
    assert any("null" in f for f in r["failures"])
    # the live publication is untouched: still generation 1, 5 rows,
    # no NULL tags
    back = spark.read.parquet(pub)
    assert back.count() == 5
    assert back.filter(F.col("tag").isNull()).count() == 0
    with open(os.path.join(pub, MANIFEST)) as fh:
        assert json.load(fh)["generation"] == 1
    assert not os.path.exists(pub + ".staging")


def test_wap_generations_increment_and_replace(spark, tmp_path):
    pub = str(tmp_path / "pub")
    for n in (3, 7):
        df = spark.range(n).select(F.col("id"))
        r = write_audit_publish(df, pub, [non_empty_audit])
        assert r["published"]
    back = spark.read.parquet(pub)
    assert back.count() == 7  # the new release REPLACED the old
    with open(os.path.join(pub, MANIFEST)) as fh:
        assert json.load(fh)["generation"] == 2


def test_wap_empty_output_refused(spark, tmp_path):
    pub = str(tmp_path / "pub")
    empty = spark.range(0).select(F.col("id"))
    r = write_audit_publish(empty, pub, [non_empty_audit])
    assert not r["published"]
    assert not os.path.exists(pub)


def test_wap_recovers_from_crash_between_renames(spark, tmp_path):
    """Simulated crash in the publish window (publish_dir already moved
    to .retired, staging not yet renamed): the next run must RESTORE
    the retired copy, not rmtree it (ADVICE r9 — data-loss bug: the
    leftover sweep deleted the only remaining good publication)."""
    pub = str(tmp_path / "pub")
    df = spark.range(5).select(F.col("id"))
    assert write_audit_publish(
        df, pub, [non_empty_audit], symlink_publish=False
    )["published"]
    # crash simulation: first rename done, second never happened; a
    # stale staging dir from the dead run is also present
    os.rename(pub, pub + ".retired")
    os.makedirs(pub + ".staging")
    with open(os.path.join(pub + ".staging", "part-junk"), "w") as fh:
        fh.write("torn write")
    r = write_audit_publish(
        spark.range(9).select(F.col("id")),
        pub,
        [non_empty_audit],
        symlink_publish=False,
    )
    assert r["published"]
    # generation continued from the RECOVERED publication (1 -> 2),
    # proving entry rolled retired back instead of deleting it
    assert r["generation"] == 2
    assert spark.read.parquet(pub).count() == 9
    assert not os.path.exists(pub + ".retired")
    assert not os.path.exists(pub + ".staging")


def test_wap_recovery_restores_readable_publication(spark, tmp_path):
    """Crash recovery alone (no new publish): entry restores the
    retired copy so a reader sees the last good generation."""
    pub = str(tmp_path / "pub")
    df = spark.range(4).select(F.col("id"))
    assert write_audit_publish(
        df, pub, [non_empty_audit], symlink_publish=False
    )["published"]
    os.rename(pub, pub + ".retired")
    # a failed-audit run must still have recovered the publication
    empty = spark.range(0).select(F.col("id"))
    r = write_audit_publish(
        empty, pub, [non_empty_audit], symlink_publish=False
    )
    assert not r["published"]
    assert spark.read.parquet(pub).count() == 4
    with open(os.path.join(pub, MANIFEST)) as fh:
        assert json.load(fh)["generation"] == 1


def test_wap_symlink_publish_no_enoent_window(spark, tmp_path):
    """symlink_publish mode: publish_dir is a symlink swapped
    atomically per generation — a reader sees old or new at every
    instant (no ENOENT window), old generations are cleaned, and the
    audit-failure path leaves the live link untouched."""
    pub = str(tmp_path / "pub")
    df = spark.range(5).select(F.col("id"))
    r = write_audit_publish(
        df, pub, [non_empty_audit], symlink_publish=True
    )
    assert r["published"] and r["generation"] == 1
    assert os.path.islink(pub)
    assert spark.read.parquet(pub).count() == 5
    # second publish: link repoints, gen1 dir removed
    r = write_audit_publish(
        spark.range(9).select(F.col("id")),
        pub,
        [non_empty_audit],
        symlink_publish=True,
    )
    assert r["generation"] == 2
    assert spark.read.parquet(pub).count() == 9
    assert not os.path.exists(pub + ".gen1")
    assert os.path.isdir(pub + ".gen2")
    # failed audit: link still points at gen2, no gen3 left behind
    empty = spark.range(0).select(F.col("id"))
    r = write_audit_publish(
        empty, pub, [non_empty_audit], symlink_publish=True
    )
    assert not r["published"] and r["generation"] == 2
    assert spark.read.parquet(pub).count() == 9
    assert not os.path.exists(pub + ".gen3")


def test_wap_symlink_upgrades_rename_mode_dir(spark, tmp_path):
    """A directory published by the rename-mode publisher upgrades in
    place: the next symlink publish continues its generation counter
    and replaces the real dir with a link."""
    pub = str(tmp_path / "pub")
    df = spark.range(3).select(F.col("id"))
    assert write_audit_publish(
        df, pub, [non_empty_audit], symlink_publish=False
    )["published"]
    assert os.path.isdir(pub) and not os.path.islink(pub)
    r = write_audit_publish(
        spark.range(7).select(F.col("id")),
        pub,
        [non_empty_audit],
        symlink_publish=True,
    )
    assert r["published"] and r["generation"] == 2
    assert os.path.islink(pub)
    assert spark.read.parquet(pub).count() == 7
    assert not os.path.exists(pub + ".legacy")


def test_wap_symlink_recovers_crashed_swap(spark, tmp_path):
    """Crash windows in link mode: an unreferenced .genN dir from a
    dead run is swept; a legacy dir moved aside before a crashed
    first swap is restored."""
    pub = str(tmp_path / "pub")
    df = spark.range(4).select(F.col("id"))
    assert write_audit_publish(
        df, pub, [non_empty_audit], symlink_publish=True
    )["published"]
    # dead run left an unreferenced generation dir
    os.makedirs(pub + ".gen99")
    r = write_audit_publish(
        spark.range(6).select(F.col("id")),
        pub,
        [non_empty_audit],
        symlink_publish=True,
    )
    assert r["published"]
    assert not os.path.exists(pub + ".gen99")
    assert spark.read.parquet(pub).count() == 6
    # crashed between move-aside and first swap: only .legacy remains
    target = os.path.join(
        os.path.dirname(pub), os.readlink(pub)
    )
    os.unlink(pub)
    os.rename(target, pub + ".legacy")
    r = write_audit_publish(
        spark.range(8).select(F.col("id")),
        pub,
        [non_empty_audit],
        symlink_publish=True,
    )
    assert r["published"]
    assert spark.read.parquet(pub).count() == 8
    # generation continued from the recovered manifest (2 -> 3)
    assert r["generation"] == 3


def test_wap_symlink_sweep_spares_near_named_siblings(spark, tmp_path):
    """The crashed-run sweep must match ONLY '<base>.gen<digits>' —
    a neighboring dir like 'pub.gen_backup' or a publish dir named
    'pub.general' is someone else's data (ADVICE r10)."""
    pub = str(tmp_path / "pub")
    os.makedirs(pub + ".gen_backup")
    with open(os.path.join(pub + ".gen_backup", "keep"), "w") as fh:
        fh.write("precious")
    os.makedirs(pub + ".general")
    os.makedirs(pub + ".gen7")  # a genuine orphan: swept
    df = spark.range(5).select(F.col("id"))
    assert write_audit_publish(df, pub, [non_empty_audit])["published"]
    assert os.path.exists(os.path.join(pub + ".gen_backup", "keep"))
    assert os.path.isdir(pub + ".general")
    assert not os.path.exists(pub + ".gen7")


def test_wap_default_degrades_without_symlink_support(
    spark, tmp_path, monkeypatch
):
    """On a filesystem that cannot hold symlinks, the symlink DEFAULT
    must degrade to the two-rename mode up front (probed before any
    data is written) — not fail mid-publish with a complete-but-
    unreachable generation dir."""
    import series_tiempo_ar_scraping_spark.sinks.wap as W

    real_symlink = os.symlink

    def no_symlink(*a, **k):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(W.os, "symlink", no_symlink)
    pub = str(tmp_path / "pub")
    df = spark.range(5).select(F.col("id"))
    r = write_audit_publish(df, pub, [non_empty_audit])
    assert r["published"] and r["generation"] == 1
    assert os.path.isdir(pub) and not os.path.islink(pub)
    assert spark.read.parquet(pub).count() == 5
    # no probe residue, no gen dirs
    assert not [
        e for e in os.listdir(str(tmp_path)) if "probe" in e or ".gen" in e
    ]
    # symlinks back (in reality: a remount — the probe result is
    # memoized per parent filesystem, so simulate the remount by
    # clearing the cache): the same dir upgrades to link mode
    monkeypatch.setattr(W.os, "symlink", real_symlink)
    W._SYMLINK_SUPPORT_CACHE.clear()
    r = write_audit_publish(
        spark.range(7).select(F.col("id")), pub, [non_empty_audit]
    )
    assert r["published"] and r["generation"] == 2
    assert os.path.islink(pub)


def test_wap_symlink_probe_memoized_and_enoent_safe(
    tmp_path, monkeypatch
):
    """ADVICE r11: the probe must (a) run at most once per parent
    filesystem — not once per publish, (b) treat a not-yet-existing
    parent as "create it and probe" rather than silently degrading the
    first publish into a new tree to rename mode, and (c) use a
    per-call-unique probe name so concurrent publishes cannot misread
    a name collision as 'unsupported'."""
    import series_tiempo_ar_scraping_spark.sinks.wap as W

    W._SYMLINK_SUPPORT_CACHE.clear()
    calls = {"n": 0}
    real_symlink = os.symlink

    def counting_symlink(*a, **k):
        calls["n"] += 1
        return real_symlink(*a, **k)

    monkeypatch.setattr(W.os, "symlink", counting_symlink)
    # (b) parent does not exist yet: must probe True, not ENOENT→False
    pub = str(tmp_path / "new" / "tree" / "pub")
    assert W._symlinks_supported(pub) is True
    assert calls["n"] == 1
    assert os.path.isdir(os.path.dirname(pub))
    # (a) second call on the same parent: memoized, no new probe
    assert W._symlinks_supported(pub) is True
    assert calls["n"] == 1
    # a sibling publish dir under the SAME parent shares the cache
    assert W._symlinks_supported(
        str(tmp_path / "new" / "tree" / "pub2")
    ) is True
    assert calls["n"] == 1
    # (c) a leftover probe file from a crashed run must not wedge the
    # probe: unique names mean FileExistsError retries with a fresh
    # name instead of reading as unsupported
    W._SYMLINK_SUPPORT_CACHE.clear()
    seq_now = next(W._PROBE_SEQ)
    stale = os.path.join(
        os.path.dirname(pub),
        f".wap_symlink_probe_{os.getpid()}_{seq_now + 1}",
    )
    real_symlink("x", stale)
    try:
        assert W._symlinks_supported(pub) is True
    finally:
        if os.path.lexists(stale):
            os.unlink(stale)
    # no probe residue anywhere
    assert not [
        e
        for e in os.listdir(os.path.dirname(pub))
        if "probe" in e and e != os.path.basename(stale)
    ]
    W._SYMLINK_SUPPORT_CACHE.clear()


def test_wap_symlink_probe_transient_errors_not_cached(
    tmp_path, monkeypatch
):
    """ADVICE r12: only errnos that actually signal 'this filesystem
    cannot hold symlinks' (EPERM/ENOTSUP/EOPNOTSUPP/EINVAL) may be
    CACHED as unsupported. A transient error (ENOSPC, momentary
    EACCES) degrades only that one call — the next publish must
    re-probe and recover link mode. And a filesystem that persistently
    raises EEXIST must terminate with a bounded retry, not recurse."""
    import errno as E

    import series_tiempo_ar_scraping_spark.sinks.wap as W

    W._SYMLINK_SUPPORT_CACHE.clear()
    real_symlink = os.symlink
    pub = str(tmp_path / "pub")

    # transient ENOSPC: this call degrades, nothing cached
    def enospc(*a, **k):
        raise OSError(E.ENOSPC, "no space")

    monkeypatch.setattr(W.os, "symlink", enospc)
    assert W._symlinks_supported(pub) is False
    assert W._SYMLINK_SUPPORT_CACHE == {}
    # next call (space freed): recovers True and caches it
    monkeypatch.setattr(W.os, "symlink", real_symlink)
    assert W._symlinks_supported(pub) is True
    assert True in W._SYMLINK_SUPPORT_CACHE.values()

    # genuine lack of support (EPERM, e.g. SMB): cached False
    W._SYMLINK_SUPPORT_CACHE.clear()

    def eperm(*a, **k):
        raise OSError(E.EPERM, "operation not permitted")

    monkeypatch.setattr(W.os, "symlink", eperm)
    assert W._symlinks_supported(pub) is False
    assert False in W._SYMLINK_SUPPORT_CACHE.values()
    # memoized: flipping symlink back does NOT re-probe (same fs)
    monkeypatch.setattr(W.os, "symlink", real_symlink)
    assert W._symlinks_supported(pub) is False

    # persistent EEXIST (weird mount): bounded — returns, no
    # RecursionError, and nothing cached (indeterminate)
    W._SYMLINK_SUPPORT_CACHE.clear()
    calls = {"n": 0}

    def always_eexist(*a, **k):
        calls["n"] += 1
        raise FileExistsError(E.EEXIST, "exists")

    monkeypatch.setattr(W.os, "symlink", always_eexist)
    assert W._symlinks_supported(pub) is False
    assert calls["n"] == 2  # one retry with a fresh name, then stop
    assert W._SYMLINK_SUPPORT_CACHE == {}
    W._SYMLINK_SUPPORT_CACHE.clear()


def test_wap_symlink_clears_stale_legacy(spark, tmp_path):
    """Crash after the swap but before rmtree(legacy): base is live,
    '.legacy' is stale. Entry must clear it — otherwise it leaks
    forever and a later dir→link upgrade would rename onto a
    non-empty dir and fail (ADVICE r10)."""
    pub = str(tmp_path / "pub")
    df = spark.range(4).select(F.col("id"))
    assert write_audit_publish(df, pub, [non_empty_audit])["published"]
    os.makedirs(pub + ".legacy")
    with open(os.path.join(pub + ".legacy", "stale"), "w") as fh:
        fh.write("dead run residue")
    r = write_audit_publish(
        spark.range(6).select(F.col("id")), pub, [non_empty_audit]
    )
    assert r["published"] and r["generation"] == 2
    assert not os.path.exists(pub + ".legacy")
    assert spark.read.parquet(pub).count() == 6
