"""Per-host persistent XLA compilation cache.

The remote-TPU ('axon') backend compiles through a tunnel at 30-60 s per
executable; a session tool that sets up a dozen executables pays minutes of
warmup on every invocation without a persistent cache. The cache directory
is keyed by hostname because an entry AOT-compiled on a different machine
(remote compile service / migrated VM) SIGABRTs on load — a per-hostname
directory only ever replays same-machine executables (the lesson learned in
tests/conftest.py, now shared by every CLI tool and bench.py).

Call :func:`enable` BEFORE the first jit compilation (importing jax is
fine; compiling is not).
"""

import os
import platform
import tempfile


def enable(min_compile_secs: float = 2.0) -> str:
    import jax

    cache_dir = os.path.join(
        tempfile.gettempdir(),
        f"beam_slam_xla_cache_{platform.node()}")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
