"""Solve-level A/B driver for the structured MG-IR big solve.

tools/profile_mg.py showed the per-phase costs (V-cycle cheb3 22.4 ms,
matvec 3.9 ms masked at 1.59M dofs) sum to ~26 ms/iter, yet the fused
chunk-4 solve runs ~44 ms/iter — and the round-2 planes/jacobi/chunk4
solve ran 21 ms/iter with a 16.7 ms V-cycle. Something about the current
planes27+chebyshev chunk program loses ~1.5x. This runs bench_big_solve
under each (impl, smoother, degree, chunk) config in its own subprocess
(fresh TPU runtime per config; results append to BENCH_extra.json with a
`config` field).

Usage: python tools/solve_ab.py "planes/chebyshev/3/4" "planes27/jacobi/2/4" ...
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cfg: str, timeout: int = 2400):
    parts = cfg.split("/")
    impl, smoother, degree, chunk = parts[:4]
    env = dict(os.environ)
    env.update({
        "FEM_TPU_BENCH_IMPL": impl,
        "FEM_TPU_BENCH_SMOOTHER": smoother,
        "FEM_TPU_BENCH_DEG": degree,
        "FEM_TPU_BENCH_CHUNK": chunk,
        "FEM_TPU_BENCH_PIPE": "1" if "pipe" in parts[4:] else "0",
    })
    t0 = time.time()
    print(f"=== {cfg} ===", file=sys.stderr, flush=True)
    try:
        subprocess.run(
            [sys.executable, "-c", "import bench; bench.bench_big_solve()"],
            timeout=timeout, check=False, cwd=ROOT, env=env,
        )
    except subprocess.TimeoutExpired:
        print(f"{cfg}: KILLED after {timeout}s", file=sys.stderr, flush=True)
    print(f"=== {cfg} done in {time.time() - t0:.0f}s ===",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    for cfg in sys.argv[1:]:
        run(cfg)
