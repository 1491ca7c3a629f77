"""End-of-round snapshot gate: refuse to ship a red repo.

Round 5 was snapshotted with two failing tests committed minutes before
the cutoff; this script makes that impossible to do silently.  Run it
before the final commit of every round:

    python tools/preflight.py            # full gate (~10 min)
    python tools/preflight.py --fast     # skip pytest, oracle gate only

Exit code 0 = green (say so in the snapshot commit message); anything
else = do not snapshot.  Steps, in fail-fast order:

1. ``pytest tests/`` (the 400+-test suite, includes the SURVEY 2.3
   inventory test and the scalar-only output-schema contract).
2. ``tools/oracle_check.py`` over the FULL registry at sf0.01 -- the
   exact-value replica of the driver's correctness gate; expects
   ``0 fail``.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    print(f"== preflight: {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"== preflight FAILED at {label} (exit {proc.returncode})")
        sys.exit(proc.returncode or 1)


def main() -> None:
    fast = "--fast" in sys.argv[1:]
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
    )
    if not fast:
        run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    run("oracle gate", [sys.executable, "tools/oracle_check.py", sf_dir])
    print("== preflight GREEN")


if __name__ == "__main__":
    main()
