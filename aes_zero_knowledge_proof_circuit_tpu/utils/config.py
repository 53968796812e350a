"""Framework configuration (typed; SURVEY.md §5 "config/flag system").

The reference has no runtime config (message length is the only parameter,
src/lib.rs:138); the TPU build adds a small typed config: platform pinning,
compilation cache, artifact cache directory, mesh shape.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

_DEF_CACHE = os.environ.get(
    "ZKAES_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "zkaes-tpu")
)


@dataclass
class Config:
    # directory for compiled circuit templates, SRS checkpoints, jax cache
    cache_dir: str = _DEF_CACHE
    # default hiding (the reference proves in zero-knowledge)
    zk: bool = True
    # mesh axis name used by parallel/ modules
    mesh_axis: str = "shard"

    @property
    def template_dir(self) -> Path:
        p = Path(self.cache_dir) / "templates"
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def srs_dir(self) -> Path:
        p = Path(self.cache_dir) / "srs"
        p.mkdir(parents=True, exist_ok=True)
        return p


CONFIG = Config()


_jax_cache_initialized = False


def init_jax_compilation_cache() -> None:
    """Persist XLA compilations across processes — limb-arithmetic programs
    are large and re-used identically every run.

    The cache directory is keyed by a host fingerprint: XLA:CPU caches AOT
    machine code compiled for the exact CPU feature set, and reusing a cache
    from a different machine loads binaries the loader itself flags with
    "could lead to execution errors such as SIGILL" — observed in round 2 as
    silently WRONG field arithmetic from round-1 cache entries."""
    global _jax_cache_initialized
    if _jax_cache_initialized:
        return
    import hashlib
    import platform

    import jax

    fp_src = "|".join([
        platform.machine(),
        platform.processor() or "",
        _cpu_flags_fingerprint(),
        jax.__version__,
    ])
    fp = hashlib.blake2s(fp_src.encode()).hexdigest()[:12]
    cache = Path(CONFIG.cache_dir) / f"jax_cache_{fp}"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax_cache_initialized = True


def _cpu_flags_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return ",".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return "unknown"
