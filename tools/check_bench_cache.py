"""Round-closing check: are the bench's XLA programs resident in .jax_cache?

BENCH_r02 and BENCH_r03 both died because the driver's bench run had to
compile the odometry step from scratch — the committed .jax_cache predated
the tree's final code change (VERDICT r3, weak #1).  This tool makes the
failure impossible to ship silently:

  1. snapshot the set of files in .jax_cache,
  2. run a SHORT REAL bench (``--frames 20 --warmup 5``) per mode in a
     subprocess.  Real dispatch, not AOT lowering: measured on this tree,
     ``jit(_step)`` produces TWO persistent-cache entries (the first call
     sees state laid out by ``_first``'s output, later calls see ``_step``'s
     own output layouts) and ``.lower().compile()`` produces a third key —
     only the real frame loop exercises exactly the entries the driver's
     run will read,
  3. any NEW cache file means that program was a cache miss: the committed
     cache would not have covered the driver's run.  The entries are now
     written, so the fix is simply ``git add .jax_cache`` — the tool prints
     the exact command and exits 1 so a round-closing script can't miss it.

Run as the LAST act of a round, after the final code commit:

    python tools/check_bench_cache.py && echo cache resident
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def snapshot():
    return set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()


def main():
    modes = sys.argv[1:] or ["es", "bpf"]
    before = snapshot()
    failures = []
    for mode in modes:
        cmd = [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--mode", mode,
            "--frames", "20",
            "--warmup", "5",
        ]
        env = dict(os.environ, PFILTER_BENCH_WORKER="1")
        print(f"[check_bench_cache] short real {mode} run...", flush=True)
        rc = subprocess.call(cmd, env=env, cwd=REPO, stdout=subprocess.DEVNULL)
        if rc != 0:
            failures.append(f"bench.py --mode {mode} exited {rc}")
    new = sorted(snapshot() - before)
    tracked = subprocess.run(
        ["git", "ls-files", ".jax_cache"], cwd=REPO, capture_output=True, text=True
    ).stdout.splitlines()
    tracked = {os.path.basename(p) for p in tracked}
    untracked = sorted(
        f for f in snapshot() if f not in tracked and not f.startswith(".")
    )

    if failures:
        print("[check_bench_cache] FAIL:", "; ".join(failures))
        return 1
    if new:
        print(f"[check_bench_cache] FAIL: {len(new)} program(s) were cache MISSES:")
        for f in new:
            print(f"  {f}")
    if untracked:
        print(f"[check_bench_cache] FAIL: {len(untracked)} cache file(s) not tracked by git:")
        for f in untracked[:20]:
            print(f"  {f}")
    if new or untracked:
        print("[check_bench_cache] fix: git add .jax_cache && git commit")
        return 1
    print("[check_bench_cache] OK: all bench programs cache-resident and tracked")
    return 0


if __name__ == "__main__":
    sys.exit(main())
