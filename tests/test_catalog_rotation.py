"""Round-close invariant: the catalog tiers must be rotated after every
driver run, or the next round's 50-query budget is wasted re-proving
green rows (the failure mode flagged by the round-3, -4, and -5
verdicts). These checks are pure-Python (no Spark session) and read the
committed CORRECTNESS_r*.json artifacts.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

import pytest

from event_streaming_bnpl_demo_spark.plans import catalog

REPO = Path(__file__).resolve().parents[1]


def _correctness_files() -> list[Path]:
    """Only GIT-TRACKED artifacts count for the rotation invariant.

    The driver writes CORRECTNESS_r{N}.json AFTER the builder's final
    commit of round N, so an untracked artifact is by construction newer
    than any commit that could have folded it — it burned the judge's
    suite in rounds 6, 7, and 8. The fold of an untracked artifact is
    the NEXT round's first commit (at which point it gets tracked and
    starts counting here).
    """
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        ).stdout.split()
    except (OSError, subprocess.SubprocessError):
        # No git available (e.g. exported tree): fall back to every
        # artifact on disk, the pre-round-9 behavior.
        out = [p.name for p in REPO.glob("CORRECTNESS_r*.json")]
    paths = [REPO / name for name in out if (REPO / name).exists()]
    return sorted(paths,
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


def test_untracked_artifact_does_not_fail_rotation(tmp_path, monkeypatch):
    """Simulate the post-close race: the driver drops a brand-new
    CORRECTNESS file AFTER the builder's last commit. The guard must not
    count it (it is untracked), so the suite the builder left green
    stays green."""
    import shutil

    work = tmp_path / "repo"
    work.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=work, check=True)
    tracked = work / "CORRECTNESS_r01.json"
    tracked.write_text(json.dumps({"q1_pricing_summary": {"match": True}}))
    subprocess.run(["git", "add", "CORRECTNESS_r01.json"], cwd=work, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "x"], cwd=work, check=True)
    # the post-close drop: a name that is nowhere in _DRIVER_CHECKED
    untracked = work / "CORRECTNESS_r99.json"
    untracked.write_text(json.dumps({"brand_new_query": {"match": True}}))

    monkeypatch.setitem(globals(), "REPO", work)
    files = _correctness_files()
    assert [p.name for p in files] == ["CORRECTNESS_r01.json"], (
        "untracked post-close artifact leaked into the rotation guard")
    shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Closed-catalog re-verification rotation (round-9 steady state)
# ---------------------------------------------------------------------------

BUDGET = 50  # the driver's per-round check budget


def test_rerun_tier_is_stalest_first():
    """With the catalog closed, already-checked oracled names must be
    ordered by (last-green round asc, name asc) so the driver budget
    drains the stalest rows first."""
    qs = catalog.all_queries()
    last = catalog._last_checked_rounds()
    checked = [n for n in catalog._ordered_names()
               if n in catalog._DRIVER_CHECKED and qs[n].oracle is not None]
    keys = [(last.get(n, 0), n) for n in checked]
    assert keys == sorted(keys), (
        "re-verification tier is not stalest-first: the driver would "
        "re-check fresh rows while stale ones age")


def test_full_catalog_reproves_within_eight_rounds():
    """Simulate the steady state: each round the driver checks the first
    BUDGET names and their last-checked stamp advances. Every oracled
    name must be re-proven within ceil(N/BUDGET) = 8 rounds, i.e. the
    rotation leaves no name starving."""
    qs = catalog.all_queries()
    oracled = [n for n, q in qs.items() if q.oracle is not None]
    last = dict(catalog._last_checked_rounds())
    start_round = max(last.values(), default=0)
    n_rounds = -(-len(oracled) // BUDGET)  # ceil
    covered: set[str] = set()
    for r in range(start_round + 1, start_round + 1 + n_rounds):
        order = sorted(
            oracled, key=lambda n: (last.get(n, 0), n))
        batch = order[:BUDGET]
        for n in batch:
            last[n] = r
        covered.update(batch)
    missing = set(oracled) - covered
    assert not missing, (
        f"{len(missing)} oracled names never re-proven in {n_rounds} "
        f"rounds of the stalest-first drain: {sorted(missing)[:10]}")
