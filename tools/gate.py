"""The full-gate runner: pytest + parity (default session) + parity
(plain session), certified against the EXACT working tree it ran on.

Round-8 post-mortem (VERDICT r8 "What's wrong" #1): the 250/250 gate was
recorded in one commit, then the fuzzer generator was widened in a later
commit WITHOUT re-running the gate — and the shipped tree was red. The
protocol fix is structural: this script writes ``GATE_STAMP.json``
containing the git TREE HASH of the working tree the checks actually
ran on (computed through a throwaway index, so a dirty tree hashes as
what's on disk, not as HEAD). A gate row in BASELINE.md/COVERAGE.md cites
the stamp; the judge (or anyone) verifies it with:

    git rev-parse HEAD^{tree}   ==   GATE_STAMP.json["tree"]

If any commit lands after the stamp, the hashes diverge and the claim is
visibly stale — re-running the gate is the only way to re-green it.

Usage:
    python tools/gate.py                 # full gate (~35-45 min)
    python tools/gate.py --skip-pytest   # parity-only refresh
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str, env: dict | None = None) -> str:
    out = subprocess.run(
        ["git", *args], cwd=REPO, env=env, check=True,
        capture_output=True, text=True,
    )
    return out.stdout.strip()


def working_tree_hash() -> tuple[str, str, bool]:
    """(tree, head, clean): hash the WORKING TREE via a throwaway index —
    never touching the real one — so the stamp certifies exactly the
    files the checks read, committed or not."""
    head = _git("rev-parse", "HEAD")
    head_tree = _git("rev-parse", "HEAD^{tree}")
    with tempfile.NamedTemporaryFile(prefix="gate_index_") as tf:
        env = dict(os.environ, GIT_INDEX_FILE=tf.name)
        _git("read-tree", "HEAD", env=env)
        _git("add", "-A", env=env)
        tree = _git("write-tree", env=env)
    return tree, head, tree == head_tree


def _run(cmd: list[str], env: dict | None = None) -> tuple[int, str]:
    print(f"[gate] running: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True
    )
    return proc.returncode, proc.stdout + proc.stderr


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-pytest", action="store_true")
    args = ap.parse_args()

    tree_before, head, clean = working_tree_hash()
    results: dict = {}
    ok = True

    if not args.skip_pytest:
        code, out = _run([sys.executable, "-m", "pytest", "tests/", "-q"])
        m = re.search(r"(\d+) passed", out)
        f = re.search(r"(\d+) failed", out)
        # A red gate must be DIAGNOSABLE from the stamp alone: record the
        # failing test ids (pytest -q prints "FAILED <id> - <reason>" in
        # the short summary) and keep the full output on disk — the first
        # red round-10 gate recorded only the count and the names were
        # gone with the subprocess.
        failed_ids = re.findall(r"^FAILED ([^\s]+)", out, re.M)
        results["pytest"] = {
            "exit": code,
            "passed": int(m.group(1)) if m else 0,
            "failed": int(f.group(1)) if f else 0,
            "failed_tests": failed_ids,
        }
        if code != 0:
            log_path = os.path.join(REPO, "gate_pytest_failure.log")
            with open(log_path, "w") as fh:
                fh.write(out)
            results["pytest"]["log"] = log_path
        ok &= code == 0
        print(out.splitlines()[-1] if out.splitlines() else "")

    for label, extra_env in (
        ("parity_default", {}),
        ("parity_plain", {"SPARK_GRAFT_PLAIN_SESSION": "1"}),
    ):
        env = dict(os.environ, **extra_env)
        code, out = _run([sys.executable, "tools/parity.py"], env=env)
        m = re.search(r"(\d+)/(\d+) pass", out)
        results[label] = {
            "exit": code,
            "pass": m.group(0) if m else "?",
        }
        ok &= code == 0 and bool(m) and m.group(1) == m.group(2)
        print(f"[gate] {label}: {results[label]['pass']} (exit {code})")

    tree_after, _, _ = working_tree_hash()
    if tree_after != tree_before:
        # Files changed UNDER the gate — the stamp would certify a tree
        # the checks did not fully run on. Refuse to stamp green.
        print(
            f"[gate] tree changed during the run "
            f"({tree_before[:12]} -> {tree_after[:12]}); not certifying",
            file=sys.stderr,
        )
        ok = False

    stamp = {
        "tree": tree_after,
        "head": head,
        "head_is_certified_tree": clean and tree_after == tree_before,
        "green": ok,
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "results": results,
    }
    with open(os.path.join(REPO, "GATE_STAMP.json"), "w") as fh:
        json.dump(stamp, fh, indent=2)
        fh.write("\n")
    print(f"[gate] stamp written: tree={tree_after} green={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
