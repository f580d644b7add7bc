"""Property-based verification of the workbook-stream offset contract
(SURVEY §2.11, r11: exact replay via recorded file lists).

The claims under test are the exactly-once ones:
- INCREMENTALITY: driving read() over any in-contract arrival sequence
  consumes every file exactly once, in lexicographic order.
- EXACT REPLAY: readBetweenOffsets(start, end) of any committed batch
  returns exactly that batch's rows — even if late files landed inside
  the range afterwards (warn mode).
- DETECTION: any out-of-contract arrival (a name sorting at or below
  the committed watermark) is detected on the next read (error mode
  raises; warn mode warns and the late file is never silently
  consumed).

Hypothesis drives randomized arrival schedules; the reader is driven
directly (it is a plain Python object — no Spark session needed), so
hundreds of examples run in seconds.
"""

from __future__ import annotations

import json
import os
import warnings

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from series_tiempo_ar_scraping_spark.sources.datasource import (
    WorkbookCellsStreamReader,
)


def _write(d: str, name: str, rows: list) -> None:
    with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
        for r, v in rows:
            fh.write(
                json.dumps(
                    {"sheet": "s", "row": r, "col": "A", "value": v}
                )
                + "\n"
            )


# an arrival schedule: batches of file indices; indices arrive as
# zero-padded names so lexicographic == numeric order. In-contract
# schedules deliver indices in increasing order across batches.
@st.composite
def in_contract_schedules(draw):
    n = draw(st.integers(min_value=1, max_value=9))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=max(1, n - 1)),
                max_size=3,
                unique=True,
            )
        )
    )
    idx = list(range(n))
    batches, lo = [], 0
    for c in cuts + [n]:
        if c > lo:
            batches.append(idx[lo:c])
            lo = c
    return batches


@settings(max_examples=60, deadline=None)
@given(in_contract_schedules())
def test_incrementality_consumes_each_file_once(tmp_path_factory, sched):
    d = str(tmp_path_factory.mktemp("landing"))
    rdr = WorkbookCellsStreamReader({"path": d})
    off = rdr.initialOffset()
    seen: list[int] = []
    committed = []  # (start, end, rows) per non-empty batch
    for batch in sched:
        for i in batch:
            _write(d, f"{i:03d}.jsonl", [(i, f"v{i}")])
        rows, end = rdr.read(off)
        rows = list(rows)
        if batch:
            committed.append((off, end, rows))
        seen.extend(r[2] for r in rows)
        off = end
        # an idle read never advances nor re-reads
        again, off2 = rdr.read(off)
        assert list(again) == [] and off2 == off
    flat = [i for b in sched for i in b]
    assert seen == sorted(flat)  # each file once, in order
    # every committed batch replays exactly, at any later time
    for start, end, rows in committed:
        assert list(rdr.readBetweenOffsets(start, end)) == rows


@settings(max_examples=40, deadline=None)
@given(
    in_contract_schedules(),
    st.integers(min_value=0, max_value=8),
)
def test_late_arrival_detected_and_replay_exact(
    tmp_path_factory, sched, late_seed
):
    d = str(tmp_path_factory.mktemp("landing"))
    strict = WorkbookCellsStreamReader({"path": d})
    lenient = WorkbookCellsStreamReader(
        {"path": d, "onLateFile": "warn"}
    )
    off = strict.initialOffset()
    committed = []
    for batch in sched:
        for i in batch:
            _write(d, f"{i:03d}.jsonl", [(i, f"v{i}")])
        rows, end = strict.read(off)
        committed.append((off, end, list(rows)))
        off = end
    # drop a LATE file strictly below the committed watermark (a name
    # between existing indices, never equal to one)
    last = int(off["last"].split(".")[0])
    late_name = f"{late_seed % (last + 1):03d}a.jsonl"
    assert late_name < off["last"] or late_name.startswith(off["last"][:3])
    _write(d, late_name, [(999, "late")])
    if late_name <= off["last"]:
        # error mode: the next read fails loudly
        with pytest.raises(RuntimeError, match="late-arriving"):
            strict.read(off)
        # warn mode: surfaced, late file never consumed
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rows, _ = lenient.read(off)
        assert any("late-arriving" in str(w.message) for w in caught)
        assert all(r[0] != late_name for r in rows)
    # replay of EVERY committed batch is unaffected by the late file
    for start, end, rows in committed:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert list(lenient.readBetweenOffsets(start, end)) == rows


@settings(max_examples=40, deadline=None)
@given(in_contract_schedules())
def test_vanished_file_fails_every_affected_replay(
    tmp_path_factory, sched
):
    d = str(tmp_path_factory.mktemp("landing"))
    rdr = WorkbookCellsStreamReader({"path": d, "onLateFile": "warn"})
    off = rdr.initialOffset()
    committed = []
    for batch in sched:
        for i in batch:
            _write(d, f"{i:03d}.jsonl", [(i, f"v{i}")])
        rows, end = rdr.read(off)
        committed.append((off, end, list(rows), list(batch)))
        off = end
    # remove ONE consumed file; every batch containing it must refuse
    # to replay (vanished), every other batch must replay exactly
    victims = [b for _, _, _, b in committed if b]
    if not victims:
        return
    victim = victims[0][0]
    os.remove(os.path.join(d, f"{victim:03d}.jsonl"))
    for start, end, rows, batch in committed:
        if victim in batch:
            with pytest.raises(RuntimeError, match="vanished"):
                list(rdr.readBetweenOffsets(start, end))
        else:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                assert list(rdr.readBetweenOffsets(start, end)) == rows
