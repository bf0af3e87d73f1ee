"""Artifact-freshness close gate (VERDICT r9 #1).

Round 8's close slipped: the committed GATE/sf1 artifacts were
generated two operator-touching commits before HEAD, and the committed
BENCH_SF1 still carried the pre-fix fuzzy join — so the round's own
ratio report exited 1 on its own artifacts.  This script makes
freshness a HARD gate; it must exit 0 on the final tree of every round:

  1. every required r{N} artifact exists;
  2. NO package/tool file is newer in git history than the artifact
     commit — i.e. `git log <artifact-commit>..HEAD` touches no file
     under clickhouse_migrator_spark/ or bench.py/__spark_entry__.py
     (artifacts must be regenerated in or after the last code commit);
  3. the committed sf1 ratio report passes (exit 0) on the committed
     artifact pair;
  4. the bench tripwire passes on the committed spread;
  5. (r11, VERDICT r10 #2) every bench artifact of the round passes its
     own contention budget — foreign_cpu_total_s ≤ 5% of wall × cpus —
     so a contaminated-but-committed number is structurally impossible;
     subset pairs pass only when both halves are in the quiet class.

Usage:
    python tools/close_check.py <round>        # e.g. 11
    python tools/close_check.py                # newest round present
Run it as the LAST step before the round's final commit, then commit
the artifacts; CI-style usage re-runs it at HEAD where the artifact
files are the committed ones.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: paths whose post-artifact modification invalidates the close
CODE_PATHS = ("clickhouse_migrator_spark/", "bench.py", "__spark_entry__.py")

#: max foreign (non-bench) CPU as a fraction of the run's wall × cpus
#: before a committed bench artifact is rejected as contaminated
#: (VERDICT r10 #2).  The r9 incident artifacts measured >10%; every
#: clean r10 artifact measured ≤2.8%.  Documented in SCALE.md.
FOREIGN_CPU_BUDGET_PCT = 5.0


def foreign_cpu_pct(art: dict) -> float | None:
    """Foreign-CPU percentage of a bench artifact's capacity
    (foreign_cpu_total_s / (wall_s × cpus) × 100), or None when no
    metric is derivable from ANY of the shapes below (ADVICE r11: the
    old top-level-only read silently exempted every non-flat artifact):

    - flat bench.py output: top-level foreign_cpu_total_s/value/cpus;
    - driver wrapper (BENCH_r{N}.json): the same fields nested under
      ``parsed`` (cpus may live at either level);
    - per-run probe records (tools/query_spread.py): ``runs`` list of
      {wall_s, foreign_cpu_s} — the MIN per-run pct, because such a
      probe's conclusion rests on its quiet floor (a probe may
      deliberately record contaminated runs to show wall tracking
      foreign CPU; the gate requires at least one certifiably quiet
      run);
    - multi-run spread (tools/bench_spread.py): parallel ``totals`` /
      ``run_foreign_cpu_total_s`` lists — MIN per-run pct for the same
      reason (the tripwire consumes per-query MINs, so the estimator
      is sound iff at least one run is quiet)."""
    if not isinstance(art, dict):
        return None
    if isinstance(art.get("parsed"), dict):
        inner = dict(art["parsed"])
        inner.setdefault("cpus", art.get("cpus"))
        return foreign_cpu_pct(inner)
    fg, wall, cpus = (
        art.get("foreign_cpu_total_s"),
        art.get("value"),
        art.get("cpus"),
    )
    if fg is not None and wall and cpus:
        return 100.0 * float(fg) / (float(wall) * float(cpus))
    runs = art.get("runs")
    if (
        isinstance(runs, list)
        and runs
        and isinstance(runs[0], dict)
        and "foreign_cpu_s" in runs[0]
        and "wall_s" in runs[0]
        and cpus
    ):
        pcts = [
            100.0 * float(r["foreign_cpu_s"]) / (float(r["wall_s"]) * float(cpus))
            for r in runs
            if r.get("wall_s")
        ]
        return min(pcts) if pcts else None
    fgr, tot = art.get("run_foreign_cpu_total_s"), art.get("totals")
    if (
        isinstance(fgr, list)
        and isinstance(tot, list)
        and fgr
        and len(fgr) == len(tot)
        and cpus
    ):
        pcts = [
            100.0 * float(f) / (float(t) * float(cpus))
            for f, t in zip(fgr, tot)
            if t and f is not None
        ]
        return min(pcts) if pcts else None
    return None


def contention_problems(
    paths: list[str],
    budget_pct: float = FOREIGN_CPU_BUDGET_PCT,
    require_metric: bool = True,
) -> list[str]:
    """Reject any committed bench artifact whose own contention metric
    exceeds the budget — a contaminated-but-committed headline number
    becomes structurally impossible, not merely visible (VERDICT r10
    #2).  A current-round artifact from which NO metric is derivable is
    itself a gate FAILURE, not a skip (ADVICE r11: the old skip let
    'parsed'-nested and per-run-only artifacts bypass the budget, which
    contradicted the contract above)."""
    out: list[str] = []
    for p in paths:
        full = p if os.path.isabs(p) else os.path.join(REPO, p)
        if not os.path.exists(full) or not os.path.basename(p).startswith("BENCH"):
            continue
        try:
            art = json.load(open(full))
        except Exception:
            continue  # unreadable artifacts are caught by their own gates
        pct = foreign_cpu_pct(art) if isinstance(art, dict) else None
        if pct is None:
            if require_metric:
                out.append(
                    f"UNGATEABLE artifact: {p} carries no derivable "
                    "foreign-CPU metric (foreign_cpu_total_s/value/cpus, a "
                    "'parsed' wrapper, per-run records, or spread run lists) "
                    "— regenerate it with the instrumented tools"
                )
        elif pct > budget_pct:
            out.append(
                f"CONTAMINATED artifact: {p} ran under {pct:.1f}% foreign CPU "
                f"(budget {budget_pct}% of wall x cpus) — regenerate in a "
                "quiet window"
            )
    return out


def newest_round() -> str | None:
    """Largest round number with a committed BENCH_LOCAL_r{N}.json —
    the bare-invocation default.  The old hardcoded default silently
    graded the PREVIOUS round after a round close (VERDICT r10 wrong
    #4)."""
    rounds = []
    for p in glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")):
        m = re.match(r"BENCH_LOCAL_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    return str(max(rounds)) if rounds else None


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _porcelain_paths(line: str) -> list[str]:
    """Path field(s) of one ``git status --porcelain`` line.  Cols 0-2
    are the status; renames carry ``old -> new`` and BOTH sides count
    as dirty.  Matching the parsed path with ``startswith`` replaces
    the old whole-line substring test, which mis-classified rename
    lines and coincidental substrings and missed hand-edited committed
    artifacts entirely (ADVICE r9)."""
    body = line[3:]
    if " -> " in body:
        old, new = body.split(" -> ", 1)
        return [old.strip().strip('"'), new.strip().strip('"')]
    return [body.strip().strip('"')]


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else newest_round()
    if rnd is None:
        print("CLOSE CHECK: no round argument and no BENCH_LOCAL_r*.json present")
        return 1
    if len(sys.argv) <= 1:
        print(f"(no round argument: checking newest round present, r{rnd})")
    problems: list[str] = []

    required = [
        f"GATE_r{rnd}_sf0001.json",
        f"GATE_r{rnd}_sf001.json",
        f"GATE_r{rnd}_sf01.json",
        f"GATE_r{rnd}_pandas_sf0001.json",
        f"GATE_r{rnd}_pandas_sf001.json",
        f"GATE_r{rnd}_pandas_sf01.json",
        f"BENCH_LOCAL_r{rnd}.json",
        f"BENCH_SPREAD_r{rnd}.json",
        f"BENCH_SF1_r{rnd}.json",
        f"PLAN_AUDIT_r{rnd}.txt",
    ]
    # round 10+: the orchestration fuzzer is part of the close gate
    # (VERDICT r9 #5) — a fresh long randomized session artifact with
    # its seed recorded for replay
    try:
        if int(rnd) >= 10:
            required.append(f"RUNNER_FUZZ_r{rnd}.json")
        # round 11+: the identifier-case-mutation fuzz is part of the
        # close gate too (VERDICT r10 #7)
        if int(rnd) >= 11:
            required.append(f"CASE_FUZZ_r{rnd}.json")
    except ValueError:
        pass
    # decade-probe subset pairs are optional per round, but when a
    # round commits one it must be fresh and pass its own ratio gate
    # (VERDICT r9 #4: the committed sf1-subset predated the sparse-grid
    # rewrite and silently inverted against sf10)
    subset_pairs = [
        (f"BENCH_SF1_SUBSET_r{rnd}.json", f"BENCH_SF10_SUBSET_r{rnd}.json", "22"),
    ]
    for a, b, _thr in subset_pairs:
        if any(os.path.exists(os.path.join(REPO, f)) for f in (a, b)):
            for f in (a, b):
                if f not in required:
                    required.append(f)  # half a pair is a missing artifact
    for f in required:
        if not os.path.exists(os.path.join(REPO, f)):
            problems.append(f"missing artifact: {f}")

    # contention gate (VERDICT r10 #2): EVERY committed bench artifact
    # of this round — required or optional probe — must pass its own
    # foreign-CPU budget; a subset pair passes only when both halves are
    # in the same quiet class (each ≤ budget bounds their divergence)
    round_bench = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, f"BENCH_*_r{rnd}.json"))
    ) + [f"BENCH_r{int(rnd):02d}.json" if str(rnd).isdigit() else f"BENCH_r{rnd}.json"]
    # from round 12 every committed bench artifact must carry a
    # derivable contention metric (ADVICE r11: a metric-less artifact
    # used to bypass the budget silently); earlier rounds' spreads
    # predate the instrumented bench_spread and stay skip-only
    require_metric = (not str(rnd).isdigit()) or int(rnd) >= 12
    problems.extend(contention_problems(round_bench, require_metric=require_metric))

    # freshness: newest commit touching any artifact must be >= newest
    # commit touching code (in history order)
    def last_commit(paths: list[str]) -> str | None:
        out = _git("log", "-1", "--format=%H", "--", *paths).strip()
        return out or None

    code_head = last_commit(list(CODE_PATHS))
    present = [f for f in required if os.path.exists(os.path.join(REPO, f))]
    if code_head and present:
        for f in present:
            art_commit = last_commit([f])
            if art_commit is None:
                problems.append(f"artifact not committed yet: {f} (commit it with/after the last code change)")
                continue
            # code_head must be an ancestor of (or equal to) art_commit
            anc = subprocess.run(
                ["git", "merge-base", "--is-ancestor", code_head, art_commit],
                cwd=REPO,
            ).returncode
            if anc != 0:
                problems.append(
                    f"STALE artifact: {f} (committed {art_commit[:9]}) predates the "
                    f"last code commit {code_head[:9]} — regenerate on the final tree"
                )

    # uncommitted code changes also invalidate any committed artifact.
    dirty = _git("status", "--porcelain").strip()
    dirty_paths = [p for ln in dirty.splitlines() for p in _porcelain_paths(ln)]
    dirty_code = [
        p for p in dirty_paths if any(p.startswith(cp) for cp in CODE_PATHS)
    ]
    if dirty_code:
        problems.append(f"uncommitted code changes: {dirty_code}")
    # a hand-edited committed artifact is just as stale as an old one
    dirty_artifacts = [p for p in dirty_paths if p in set(required)]
    if dirty_artifacts:
        problems.append(
            f"uncommitted modifications to required artifacts: {dirty_artifacts}"
        )

    # the round's own gates must pass on the committed artifacts
    sf1_base = os.path.join(REPO, f"BENCH_SF1_BASE_r{rnd}.json")
    base = sf1_base if os.path.exists(sf1_base) else os.path.join(REPO, f"BENCH_LOCAL_r{rnd}.json")
    if os.path.exists(base) and os.path.exists(os.path.join(REPO, f"BENCH_SF1_r{rnd}.json")):
        r = subprocess.run(
            [sys.executable, "tools/sf1_ratio_report.py", base, f"BENCH_SF1_r{rnd}.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            problems.append(
                "sf1_ratio_report exits nonzero on the committed pair:\n" + r.stdout[-1500:]
            )
    for a, b, thr in subset_pairs:
        if os.path.exists(os.path.join(REPO, a)) and os.path.exists(
            os.path.join(REPO, b)
        ):
            r = subprocess.run(
                [sys.executable, "tools/sf1_ratio_report.py", "--threshold", thr, a, b],
                cwd=REPO,
                capture_output=True,
                text=True,
            )
            if r.returncode != 0:
                problems.append(
                    f"subset ratio report ({a} vs {b}) exits nonzero:\n"
                    + r.stdout[-1500:]
                )
    for fuzz_name in (f"RUNNER_FUZZ_r{rnd}.json", f"CASE_FUZZ_r{rnd}.json"):
        fuzz_art = os.path.join(REPO, fuzz_name)
        if not os.path.exists(fuzz_art):
            continue
        try:
            fz = json.load(open(fuzz_art))
            if fz.get("failures", 1) != 0 or "seed" not in fz:
                problems.append(
                    f"{fuzz_name} must record seed and zero failures: "
                    f"failures={fz.get('failures')!r} seed={fz.get('seed')!r}"
                )
        except Exception as e:  # malformed artifact is a failed gate
            problems.append(f"{fuzz_name} unreadable: {e}")
    if os.path.exists(os.path.join(REPO, f"BENCH_SPREAD_r{rnd}.json")):
        r = subprocess.run(
            [sys.executable, "tools/bench_tripwire.py", f"BENCH_SPREAD_r{rnd}.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            problems.append("bench_tripwire exits nonzero:\n" + r.stdout[-1500:])

    if problems:
        print(f"CLOSE CHECK r{rnd}: FAIL")
        for p in problems:
            print(" -", p)
        return 1
    print(f"CLOSE CHECK r{rnd}: OK ({len(present)} artifacts fresh, gates pass)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
