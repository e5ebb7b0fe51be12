"""Round-close invariant: the catalog tiers must be rotated after every
driver run, or the next round's 50-query budget is wasted re-proving
green rows (the failure mode flagged by the round-3, -4, and -5
verdicts). These checks are pure-Python (no Spark session) and read the
committed CORRECTNESS_r*.json artifacts.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from event_streaming_bnpl_demo_spark.plans import catalog

REPO = Path(__file__).resolve().parents[1]


def _correctness_files() -> list[Path]:
    return sorted(REPO.glob("CORRECTNESS_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)))


def _green_names() -> set[str]:
    """Every query name with a green driver row in any round's artifact."""
    green: set[str] = set()
    for path in _correctness_files():
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if isinstance(row, dict) and (
                row.get("match") or row.get("rows_match") or row.get("ok")
            ):
                green.add(name)
    return green


def test_latest_round_folded_into_driver_checked():
    files = _correctness_files()
    if not files:
        pytest.skip("no CORRECTNESS artifacts committed yet")
    latest = json.loads(files[-1].read_text())
    missing = set(latest) - catalog._DRIVER_CHECKED
    assert not missing, (
        f"rotation not performed: {sorted(missing)} checked in "
        f"{files[-1].name} but absent from _DRIVER_CHECKED — fold them in "
        "as part of the round-close commit"
    )


def test_priority_tier_has_no_green_rows():
    green = _green_names()
    stale = [n for n in catalog._PRIORITY if n in green]
    assert not stale, (
        f"_PRIORITY still holds already-green names {stale} — the next "
        "driver run would waste budget re-checking them; clear the tier"
    )


def test_driver_checked_names_are_registered():
    """A checked name that disappears from the registry means a query was
    renamed or deleted after earning a green row — flag it so coverage
    claims stay countable."""
    names = set(catalog.all_queries())
    ghosts = catalog._DRIVER_CHECKED - names
    assert not ghosts, f"_DRIVER_CHECKED contains unregistered names: {sorted(ghosts)}"


def test_deferred_excludes_checked():
    dup = [n for n in catalog._DEFERRED if n in catalog._DRIVER_CHECKED]
    assert not dup, (
        f"_DEFERRED names {dup} already checked — they must flow into the "
        "rerun tier, not pin a deferred slot"
    )


def test_ordered_names_unique():
    names = catalog._ordered_names()
    assert len(names) == len(set(names)), "duplicate names in catalog order"
