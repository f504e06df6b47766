"""Persistent XLA compilation cache for fast process restarts.

The reference framework pays Keras graph (re)tracing on every process
start (reference notebook 03 cells 12/19 rebuild + `load_model` retrace);
on this TPU relay every fresh jitted program costs 20-40 s of remote
compile.  JAX ships a persistent compilation cache keyed by HLO hash —
enabling it makes every subsequent process reuse the serialized
executables from disk.

Measured on the flagship serving path through the axon relay
(`tests/tpu_scripts/compile_cache_flagship.py`): first serving call
49.3 s cold -> 13.5 s warm; full model build + first call 126.6 s cold
-> ~36 s warm (3.5x process-start speedup, 44 MB cache).

Usage (before building models; examples call this by default):

    from ssdseglib_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()            # ~/.cache/ssdseglib_tpu/jax_cache/host-<isa>
    enable_compile_cache("/fast/dir") # explicit location (+ host-<isa> subdir)

The cache lives in a per-host-ISA subdirectory (``host-<fingerprint>``):
XLA:CPU cache entries are AOT executables compiled against the writing
host's CPU features and can SIGILL on a narrower host when containers
migrate between heterogeneous machines.

Environment override: ``SSDSEGLIB_COMPILE_CACHE`` sets the directory
(``0``/``off`` disables the default-on behaviour in examples).
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_VAR = "SSDSEGLIB_COMPILE_CACHE"
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ssdseglib_tpu", "jax_cache"
)


def _host_fingerprint() -> str:
    """Short stable id of the host CPU's ISA feature set.

    XLA:CPU cache entries are AOT executables compiled against the
    compile host's CPU features; loading one on a host with a narrower
    feature set risks SIGILL (observed: entries written by an earlier
    container on an AMX-capable machine spam feature-mismatch errors on
    this host).  Scoping the cache directory per feature set makes CPU
    entries host-safe; remote-TPU entries don't depend on local ISA and
    simply re-cache per host generation (rare).
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        flags = f"{platform.machine()}|{platform.processor()}"
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache.

    cache_dir: cache location; defaults to ``$SSDSEGLIB_COMPILE_CACHE`` if
        set, else ``~/.cache/ssdseglib_tpu/jax_cache``.  Passing a
        directory always enables; with no argument, an env value of
        ``0``/``off``/``false``/empty disables and returns None.

    An EXPLICITLY requested location (the `cache_dir` argument or a
    directory in ``$SSDSEGLIB_COMPILE_CACHE``) is honored exactly — a
    pre-warmed cache at that path stays visible to external tooling
    (ADVICE r4); only the DEFAULT location gets the per-host-ISA
    ``host-<fingerprint>`` subdirectory that keeps XLA:CPU AOT entries
    from SIGILLing when containers migrate across heterogeneous hosts.

    Returns the cache directory in use, or None when disabled.  Safe to
    call multiple times and before or after the backend initializes (the
    cache is consulted at compile time, not at backend init).
    """
    import jax

    explicit = cache_dir is not None
    if cache_dir is None:
        env = os.environ.get(_ENV_VAR)
        if env is not None and env.strip().lower() in (
            "", "0", "off", "false", "no",
        ):
            return None
        if env:
            explicit = True
            cache_dir = env
        else:
            cache_dir = _DEFAULT_DIR
    if not explicit:
        # per-host-ISA subdirectory: XLA:CPU entries are AOT-compiled
        # against the writing host's CPU features and may SIGILL on a
        # narrower host (fleet containers migrate between machines)
        cache_dir = os.path.join(cache_dir, f"host-{_host_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: the default min-compile-time threshold (1 s) would
    # skip the many small helper programs that still cost a relay RTT each
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
