"""Fast pre-commit correctness gate (round-13, round-12 verdict #8).

The two authoritative gates -- the FULL ``tools/oracle_check.py`` (~8 min
over 223 queries) and ``pytest tests/`` (~20 min) -- are too slow for a
per-commit loop.  This tool runs the oracle gate over exactly the slice a
commit can plausibly affect:

* the CHANGED-QUERY subset: every registered query whose implementing
  module changed vs git (working tree vs HEAD by default; ``--ref`` for
  a committed range), plus every query whose implementing module IMPORTS
  a changed package module (one import hop -- the dominant coupling in
  this repo: ``queries/*`` wrapping ``operators/*``);
* the DRIVER'S WINDOW: the first N registry entries (default 50), the
  same slice ``oracle_check.py --window`` replicates -- so the gate
  always exercises a stable cross-section even when nothing mapped.

Usage: python tools/gate.py [sf_dir] [--ref GITREF] [--window N]
       python tools/gate.py --list          # show the selection, don't run

Exit code = oracle_check's (0 iff everything passes).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _changed_py_files(ref: str) -> set[str]:
    """Package .py files changed vs ``ref`` (committed diff + working
    tree + staged + untracked)."""
    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--", "*.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "--", "*.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    return {f.strip() for f in out + untracked if f.strip()}


def _import_words(src: str) -> set[str]:
    """Module-name words appearing in the file's import statements."""
    words: set[str] = set()
    for line in src.splitlines():
        line = line.strip()
        if line.startswith(("import ", "from ")):
            words.update(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", line))
    return words


def select_queries(ref: str) -> tuple[list[str], set[str]]:
    """(affected registry query names, changed package files)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    changed = _changed_py_files(ref)
    pkg_changed = {f for f in changed
                   if f.startswith("dask_patternsearch_spark/")}
    changed_mods = {os.path.splitext(os.path.basename(f))[0]
                    for f in pkg_changed}
    affected: list[str] = []
    src_cache: dict[str, str] = {}
    for name, fn in qs.items():
        mod = sys.modules.get(fn.__module__)
        f = getattr(mod, "__file__", None)
        if not f:
            continue
        rel = os.path.relpath(f, REPO)
        if rel in pkg_changed:
            affected.append(name)
            continue
        if rel not in src_cache:
            with open(f) as fh:
                src_cache[rel] = fh.read()
        if changed_mods & _import_words(src_cache[rel]):
            affected.append(name)
    return affected, pkg_changed


def main() -> int:
    args = sys.argv[1:]
    ref, window, list_only = "HEAD", 50, False
    sf_dir = "/root/testdata/sf0.01"
    if "--ref" in args:
        i = args.index("--ref")
        ref = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--list" in args:
        list_only = True
        args.remove("--list")
    if args:
        sf_dir = args[0]

    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    affected, pkg_changed = select_queries(ref)
    names = list(dict.fromkeys(affected + registry[:window]))
    print(f"# gate: {len(pkg_changed)} changed package files vs {ref} -> "
          f"{len(affected)} affected queries + first-{window} window = "
          f"{len(names)} to check", file=sys.stderr)
    if affected:
        print(f"# affected: {' '.join(sorted(affected))}", file=sys.stderr)
    if list_only:
        print("\n".join(names))
        return 0
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
         sf_dir, *names], cwd=REPO)


if __name__ == "__main__":
    raise SystemExit(main())
