"""Paired A/B benchmark harness: alternate two bench commands in ONE
session and report per-round paired deltas.

Why: single-number chip benchmarks here ride a remote-attached TPU
tunnel whose bandwidth/latency swings 2-4x across (and within!)
sessions — the same commit measured 17-34 fps on the headline config
across sessions (VERDICT round 4, Weak #3). Sequential before/after
runs therefore cannot attribute a delta to a code change. This harness
interleaves the two variants A,B,A,B,... minutes apart, so each pair
shares tunnel weather, and reports the MEDIAN PAIRED RATIO — the only
number that survives the session lottery.

Usage:
  # Compare working tree vs a git ref (ref runs from a worktree):
  python tools/bench_ab.py --ref-b HEAD~1 \
      --cmd "python bench.py --config stereo_kitti" --rounds 3

  # Compare two arbitrary commands (e.g. env/flag toggles), same tree:
  python tools/bench_ab.py --cmd "python bench.py --config mono_tum30" \
      --cmd-b "SLAM_X=1 python bench.py --config mono_tum30"

Each command must print (as its last JSON-looking line) a bench record
with "value" (fps) — bench.py's contract; "ate_m" is carried through
when present so quality shifts are visible next to speed deltas.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cmd(cmd: str, cwd: str) -> dict:
    """Run one bench command; parse the last JSON line of stdout."""
    proc = subprocess.run(
        cmd, shell=True, cwd=cwd, capture_output=True, text=True,
        timeout=3600,
    )
    rec = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                pass
    if rec is None or "value" not in rec:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-2000:])
        raise RuntimeError(f"no bench JSON from: {cmd} (cwd {cwd})")
    return rec


def make_worktree(ref: str) -> str:
    path = tempfile.mkdtemp(prefix="bench_ab_")
    # tempfile created the dir; git worktree add wants to create it.
    os.rmdir(path)
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, ref],
        cwd=REPO, check=True, capture_output=True,
    )
    return path


def drop_worktree(path: str):
    subprocess.run(
        ["git", "worktree", "remove", "--force", path],
        cwd=REPO, capture_output=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cmd", required=True,
                    help="bench command for arm A (working tree)")
    ap.add_argument("--cmd-b", default=None,
                    help="bench command for arm B (default: same as --cmd)")
    ap.add_argument("--ref-b", default=None,
                    help="git ref for arm B; runs from a detached worktree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--label-a", default="A(worktree)")
    ap.add_argument("--label-b", default=None)
    args = ap.parse_args()

    cmd_b = args.cmd_b or args.cmd
    cwd_b = REPO
    label_b = args.label_b or (
        f"B({args.ref_b})" if args.ref_b else "B(cmd)"
    )
    wt = None
    if args.ref_b:
        wt = make_worktree(args.ref_b)
        cwd_b = wt
    try:
        pairs = []
        for r in range(args.rounds):
            a = run_cmd(args.cmd, REPO)
            b = run_cmd(cmd_b, cwd_b)
            ratio = a["value"] / b["value"] if b["value"] else float("inf")
            pairs.append((a, b, ratio))
            print(json.dumps({
                "round": r,
                "a_fps": a["value"], "b_fps": b["value"],
                "a_over_b": round(ratio, 3),
                "a_ate_m": a.get("ate_m"), "b_ate_m": b.get("ate_m"),
            }), flush=True)
        ratios = [p[2] for p in pairs]
        summary = {
            "label_a": args.label_a, "label_b": label_b,
            "cmd": args.cmd, "cmd_b": cmd_b, "rounds": args.rounds,
            "median_paired_ratio_a_over_b": round(
                statistics.median(ratios), 3
            ),
            "a_fps_all": [p[0]["value"] for p in pairs],
            "b_fps_all": [p[1]["value"] for p in pairs],
            "a_ate_all": [p[0].get("ate_m") for p in pairs],
            "b_ate_all": [p[1].get("ate_m") for p in pairs],
        }
        print(json.dumps(summary))
    finally:
        if wt:
            drop_worktree(wt)


if __name__ == "__main__":
    main()
