"""Probe: do (a) jax persistent compilation cache and (b)
jax.experimental.serialize_executable work through the axon TPU relay?

Both would eliminate the 20-40 s remote compile every fresh process pays
per jitted program in this container (CLAUDE.md gotchas).  Run on TPU:

    python tests/tpu_scripts/compile_cache_probe.py
"""

from __future__ import annotations

import os
import time

CACHE_DIR = "/tmp/ssdseglib_jax_cache_probe"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices())

    # --- (a) persistent compilation cache ---
    os.makedirs(CACHE_DIR, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # noqa: BLE001
        print("cache config failed:", e)

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum(axis=1)

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(f(x))
    t1 = time.perf_counter()
    print(f"first compile+run: {t1 - t0:.2f}s")
    entries = os.listdir(CACHE_DIR)
    print(f"cache entries after compile: {len(entries)} -> {entries[:3]}")

    # --- (b) serialize_executable ---
    try:
        from jax.experimental import serialize_executable as se

        lowered = jax.jit(lambda x: (x * 2 + 1).sum()).lower(x)
        compiled = lowered.compile()
        t0 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(compiled)
        t1 = time.perf_counter()
        print(
            f"serialize ok: {len(payload)} bytes in {t1 - t0:.2f}s"
        )
        t0 = time.perf_counter()
        reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
        t1 = time.perf_counter()
        out = reloaded(x)
        print(
            f"deserialize+run ok in {t1 - t0:.2f}s, "
            f"result finite: {bool(np.isfinite(np.asarray(out)))}"
        )
    except Exception as e:  # noqa: BLE001
        print("serialize_executable FAILED:", type(e).__name__, e)


if __name__ == "__main__":
    main()
