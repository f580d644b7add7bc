"""Shared crash-injection harness (r11): simulate a process death
between any two filesystem mutations of a code path by wrapping its
module's mutating os/shutil calls and raising on the k-th call.

Usage (see test_wap_crash_enumeration.py; the compaction windows in
test_formats.py are staged by hand because that code path's only
Python-side mutations are its two renames + one rmtree):

    inj = Injector(monkeypatch, module, crash_at=k)
    with pytest.raises(InjectedCrash):
        run_the_operation()
    # assert reader-visible invariants, then recovery

Enumerate k = 1..count_mutations(...) to cover every window. The first
application of this harness found three real bugs (two in WAP, one in
the observation-store compaction) that four rounds of by-hand
crash-window review had missed.
"""

from __future__ import annotations


class InjectedCrash(RuntimeError):
    pass


_MUTATORS = ("rename", "replace", "symlink", "unlink", "remove", "rmdir")


class Injector:
    """Raise InjectedCrash on the crash_at-th mutating call made
    through ``module``'s os/shutil bindings — the k-1 preceding calls
    take effect first, exactly like a death between two mutations."""

    def __init__(self, monkeypatch, module, crash_at: int):
        self.crash_at = crash_at
        self.calls = 0

        def wrap(mod, name):
            real = getattr(mod, name)

            def wrapped(*a, **k):
                self.calls += 1
                if self.calls == self.crash_at:
                    raise InjectedCrash(f"{name} call #{self.calls}")
                return real(*a, **k)

            monkeypatch.setattr(mod, name, wrapped)

        os_mod = getattr(module, "os", None)
        if os_mod is not None:
            for name in _MUTATORS:
                if hasattr(os_mod, name):
                    wrap(os_mod, name)
        sh_mod = getattr(module, "shutil", None)
        if sh_mod is not None and hasattr(sh_mod, "rmtree"):
            wrap(sh_mod, "rmtree")


def count_mutations(monkeypatch_factory, module, operation) -> int:
    """Dry-run ``operation`` counting its mutating calls (no crash)."""
    mp = monkeypatch_factory()
    inj = Injector(mp, module, crash_at=10**9)
    operation()
    mp.undo()
    return inj.calls
