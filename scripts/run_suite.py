"""Run the full test suite with per-file process isolation.

The XLA CPU compiler on this jaxlib (0.9.0) intermittently SEGFAULTS
when compiling large shard_map programs late in a long-lived process
(reproducibly: tests/test_sharded.py's restart program after ~70 other
programs have compiled; the same test passes standalone every time).
Until that is fixed upstream, the reliable full-suite entry point is
this runner: one pytest process per test file, aggregated exit code.

Usage: python scripts/run_suite.py [extra pytest args...]
  e.g. python scripts/run_suite.py -m "not slow"
"""

from __future__ import annotations

import glob
import subprocess
import sys
import time


def main() -> int:
    files = sorted(glob.glob("tests/test_*.py"))
    extra = sys.argv[1:]
    t0 = time.time()
    failures = []
    for f in files:
        t = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", *extra],
        )
        status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        # pytest exit code 5 = no tests collected (e.g. all deselected).
        if proc.returncode not in (0, 5):
            failures.append((f, proc.returncode))
        print(f"## {f}: {status} ({time.time() - t:.0f}s)", flush=True)
    print(f"## total {time.time() - t0:.0f}s; "
          f"{len(failures)} failing file(s): {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
