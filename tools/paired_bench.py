"""Paired same-window A/B bench: HEAD vs a pinned prior commit.

Round-over-round BENCH_rN.json deltas are uninterpretable on this VM
(2-3x noisy-neighbor wall swings minute-to-minute; r3's "knn 3.35x
slower" evaporated under pairing). The only trustworthy protocol is to
ALTERNATE the two trees in one window and compare per-query medians.

Usage:
    python tools/paired_bench.py <commit> [n_rounds] [query,query,...]

  * checks out <commit> into a git worktree under /tmp (reused if
    present), leaving the repo untouched;
  * runs `python bench.py` alternately in HEAD and the pinned tree
    n_rounds times each (default 3), same env, single-shot timings
    (BENCH_REPEATS=1 — pairing replaces best-of);
  * prints a per-query table of medians and the ratio HEAD/pinned,
    plus one JSON line for machine consumption.

A ratio is flagged only when the min-max bands of the two sides do not
overlap — overlapping bands are VM noise by this protocol's own
standard, not a verdict.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_worktree(commit: str) -> str:
    path = f"/tmp/paired_{commit[:10]}"
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--force", path, commit],
            check=True,
            capture_output=True,
        )
    return path


def run_bench(tree: str, subset: str | None) -> dict:
    env = dict(os.environ)
    env["BENCH_REPEATS"] = "1"
    env["PYTHONPATH"] = tree
    if subset:
        env["BENCH_QUERIES"] = subset
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=tree,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise RuntimeError(
        f"no bench line from {tree}:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
    )


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    commit = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    subset = sys.argv[3] if len(sys.argv) > 3 else None

    pinned = ensure_worktree(commit)
    head_runs: list[dict] = []
    pin_runs: list[dict] = []
    for i in range(rounds):
        # alternate H,P,P,H,H,P,... so slow drift hits both sides equally
        order = [(REPO, head_runs), (pinned, pin_runs)]
        if i % 2:
            order.reverse()
        for tree, acc in order:
            acc.append(run_bench(tree, subset))
            print(
                json.dumps(
                    {"round": i + 1, "tree": os.path.basename(tree), **acc[-1]}
                ),
                flush=True,
            )

    names = sorted(set(head_runs[0]) & set(pin_runs[0]))
    table = {}
    print(f"\n{'query':<18}{'HEAD med':>10}{'pin med':>10}{'ratio':>8}  band verdict")
    for q in names:
        h = sorted(r[q] for r in head_runs if q in r)
        p = sorted(r[q] for r in pin_runs if q in r)
        hm, pm = statistics.median(h), statistics.median(p)
        ratio = hm / pm if pm else float("inf")
        # non-overlapping min-max bands = a real difference by this
        # protocol; anything else is within the VM's noise floor
        real = h[0] > p[-1] or h[-1] < p[0]
        verdict = ("REAL " + ("slower" if hm > pm else "faster")) if real else "noise-band"
        table[q] = {
            "head_median": round(hm, 3),
            "pinned_median": round(pm, 3),
            "ratio": round(ratio, 3),
            "head_band": [h[0], h[-1]],
            "pinned_band": [p[0], p[-1]],
            "verdict": verdict,
        }
        print(f"{q:<18}{hm:>10.3f}{pm:>10.3f}{ratio:>8.2f}  {verdict} "
              f"H[{h[0]:.2f}-{h[-1]:.2f}] P[{p[0]:.2f}-{p[-1]:.2f}]")
    print(json.dumps({"pinned": commit, "rounds": rounds, "paired": table}))


if __name__ == "__main__":
    main()
