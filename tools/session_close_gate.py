#!/usr/bin/env python
"""Session-close gate: no engine/oracle edit ships ungated.

The r11 close-discipline hole (VERDICT r11, "What's wrong" #1): the
full-catalog oracle sweep ran at commit S, COVERAGE recorded "catalog
frozen", and a later engine+oracle edit landed in the end-of-round
snapshot commit — shipped without any gate seeing it. This tool makes
that ordering impossible to repeat silently:

  python tools/session_close_gate.py --sweep-commit <S> [--sf DIR ...]

1. FAILS if the working tree is dirty anywhere under the package or
   tools/ (a close must be judged from committed state).
2. Diffs HEAD against the sweep commit. No package diff -> PASS (the
   sweep's 352/352 still covers HEAD verbatim).
3. If only `plans/` modules changed, derives the affected catalog
   names — queries DEFINED in a changed module plus queries of every
   module that IMPORTS a changed module (composed pipelines like
   llm_dedup_verified re-gate when their building block changes) —
   and re-runs the strict oracle gate on exactly those names at each
   --sf tier, recording the log next to the sweep logs.
4. If anything OUTSIDE plans/ changed (operators/, streaming/,
   sources/, functions/, engine/session), per-name re-gating is not
   sound — shared infra can shift any query — so the tool demands a
   fresh full sweep (run one with tools/driver_gate_check.py --all,
   then re-point --sweep-commit at the new commit).

Exit 0 only when HEAD is gate-clean. COVERAGE.md's close section cites
this tool's output; the driver's stall detector sees the commit either
way, so the only way to ship an ungated edit is to not run the close.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "event_streaming_bnpl_demo_spark"
PLANS = f"{PKG}/plans"


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          capture_output=True, text=True).stdout


def module_import_graph() -> dict[str, set[str]]:
    """plans module basename -> set of plans modules it imports
    (regex over `from .X import` / `from ..plans.X import`)."""
    graph: dict[str, set[str]] = {}
    plans_dir = os.path.join(REPO, PLANS)
    pat = re.compile(r"from\s+\.+(?:plans\.)?(\w+)\s+import")
    for fn in os.listdir(plans_dir):
        if not fn.endswith(".py"):
            continue
        with open(os.path.join(plans_dir, fn)) as f:
            graph[fn[:-3]] = set(pat.findall(f.read()))
    return graph


def affected_names(changed_plan_modules: set[str]) -> set[str]:
    """Catalog names whose defining module changed, or whose defining
    module imports a changed module (transitively)."""
    graph = module_import_graph()
    # transitively expand: a module is tainted if it imports a tainted
    tainted = set(changed_plan_modules)
    while True:
        more = {m for m, imps in graph.items()
                if m not in tainted and imps & tainted}
        if not more:
            break
        tainted |= more

    import inspect

    sys.path.insert(0, REPO)
    from event_streaming_bnpl_demo_spark.plans.catalog import all_queries
    names = set()
    for name, q in all_queries().items():
        mod = inspect.getmodule(q.fn)
        base = os.path.splitext(os.path.basename(mod.__file__ or ""))[0]
        if base in tainted:
            names.add(name)
    return names


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep-commit", required=True,
                    help="commit the full-catalog sweep ran at")
    ap.add_argument("--sf", action="append", default=None,
                    help="sf dir(s) to re-gate changed names at "
                    "(default: /root/testdata/sf0.01; repeatable)")
    ap.add_argument("--log", default="/tmp/close_gate.log")
    ap.add_argument("--dry-run", action="store_true",
                    help="report the affected-name set, don't gate")
    args = ap.parse_args()
    sfs = args.sf or ["/root/testdata/sf0.01"]

    dirty = [ln for ln in _git("status", "--porcelain",
                               "--", PKG, "tools", "bench.py",
                               "__spark_entry__.py").splitlines() if ln]
    if dirty:
        print("FAIL: working tree dirty — commit before closing:")
        print("\n".join(dirty))
        return 2

    diff = [ln for ln in _git("diff", "--name-only",
                              f"{args.sweep_commit}..HEAD",
                              "--", PKG).splitlines() if ln]
    if not diff:
        print(f"PASS: no package diff vs sweep commit "
              f"{args.sweep_commit[:12]} — sweep covers HEAD verbatim")
        return 0

    outside = [f for f in diff if not f.startswith(PLANS + "/")]
    if outside:
        print("FAIL: non-plans package files changed since the sweep — "
              "per-name re-gating is not sound for shared infra; run a "
              "fresh full sweep (tools/driver_gate_check.py --all) and "
              "re-point --sweep-commit:")
        print("\n".join(f"  {f}" for f in outside))
        return 3

    changed_mods = {os.path.splitext(os.path.basename(f))[0] for f in diff}
    names = sorted(affected_names(changed_mods))
    print(f"changed plan modules: {sorted(changed_mods)}")
    print(f"affected catalog names ({len(names)}): {names}")
    if args.dry_run:
        return 0
    if not names:
        print("PASS: changed modules define no catalog names")
        return 0

    for sf in sfs:
        cmd = [sys.executable, os.path.join(REPO, "tools",
                                            "driver_gate_check.py"),
               "--sf", sf, "--names", *names]
        print(f"re-gating {len(names)} names at {sf} "
              f"(log: {args.log})")
        with open(args.log, "a") as log:
            log.write(f"== close gate @ HEAD vs {args.sweep_commit} "
                      f"sf={sf} names={names}\n")
            log.flush()
            rc = subprocess.run(cmd, stdout=log,
                                stderr=subprocess.DEVNULL).returncode
        tail = subprocess.run(["tail", "-3", args.log],
                              capture_output=True, text=True).stdout
        print(tail)
        if rc != 0:
            print(f"FAIL: re-gate failed at {sf} (see {args.log})")
            return 4
    print("PASS: every post-sweep plan edit re-gated green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
