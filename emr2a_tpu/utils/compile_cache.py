"""Persistent XLA compilation cache for the serving CLIs.

A fresh serving process repays every jit compile — ~10 min for the
full continuous-serving program set at 8B (PERF_NOTES, step4 section).
JAX's client-side persistent cache serializes compiled executables
keyed by HLO fingerprint, and it DOES work through the axon-tunneled
TPU backend (measured: cold 11.57 s -> warm 1.49 s on a 4-layer
8B-geometry decode chunk, ``BENCH_compile_cache.json``), so a
long-lived service only pays the compile wall once per program shape
ever, not once per process.

Replaces nothing in the reference (it has no compiled programs); this
is TPU-native operational machinery for the serving paths built around
/root/reference/pipelines/step4_vlm_review/vlm_audit_module.py:249-364.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

ENV_VAR = "EMR2A_COMPILE_CACHE"

_enabled_dir: Optional[str] = None


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, then the ``EMR2A_COMPILE_CACHE``
    environment variable; returns the resolved directory, or None when
    neither is set (no-op).  Safe to call any time before the first jit
    compile — the cache config is consulted at compile time, not at
    backend init.  Thresholds are zeroed so every serving program is
    persisted (the default 1 s/min-size floors would skip the small
    per-bucket prefill programs that multiply the cold wall).
    """
    global _enabled_dir
    resolved = cache_dir or os.environ.get(ENV_VAR) or None
    if not resolved:
        return None
    resolved = os.path.abspath(os.path.expanduser(resolved))
    if _enabled_dir == resolved:
        return resolved
    os.makedirs(resolved, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", resolved)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled_dir = resolved
    logger.info("Persistent XLA compile cache at %s", resolved)
    return resolved


def add_compile_cache_arg(parser) -> None:
    """Attach the shared ``--compile_cache`` flag to an argparse parser."""
    parser.add_argument(
        "--compile_cache", default=None, metavar="DIR",
        help="persistent XLA compile-cache directory (default: "
             f"${ENV_VAR} if set). A fresh 8B serving process pays "
             "~10 min of compiles; with the cache, every program "
             "compiled by ANY prior process loads in seconds "
             "(measured 7.8x on this backend, BENCH_compile_cache.json)")
