"""Persistent XLA compilation cache for serving/bench cold starts.

The pack/search kernels are Mosaic-compiled per process: at 200k rows
the unrolled pack kernel alone costs ~15 s of compile on the first call
(BENCH_r04 ``pack_build_s`` 15.63 s vs ``pack_steady_s`` 0.04 s). The
reference pays the analogous cost as CUDA context + cudnn autotune per
process. JAX ships a persistent on-disk compilation cache keyed by the
HLO fingerprint + compile options + platform; enabling it turns every
process after the first into a cache hit, so a serve restart re-acquires
its full compiled state in well under a second per program.

Call :func:`enable_compilation_cache` BEFORE the first compilation (it
is safe to call any time — entries compiled earlier in the process are
simply not persisted). Entry points that want it: ``cli/serve.py``,
``bench.py``, the probe scripts.

Env knobs:
  VSEARCH_TPU_COMPILE_CACHE      cache directory (default
                                 ~/.cache/vsearch_tpu/xla). Set to the
                                 empty string to disable.
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_DEFAULT_DIR = "~/.cache/vsearch_tpu/xla"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the resolved directory, or None if disabled (empty env var)
    or unsupported by this jax build. Thresholds are set so even small
    programs persist: the serve cold path is dominated by one huge
    Mosaic kernel, but the surrounding programs (search sweep, top-k
    merge) each cost 1-20 s of XLA time too.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("VSEARCH_TPU_COMPILE_CACHE",
                                   _DEFAULT_DIR)
    if not cache_dir:
        return None
    path = Path(cache_dir).expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:  # read-only fs etc. — run uncached
        logger.warning("compilation cache disabled (%s): %s", path, e)
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        # persist everything that took >=1s to compile, any size
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # option renamed/absent in this jax
        logger.warning("persistent compilation cache unsupported by "
                       "this jax build")
        return None
    return str(path)
