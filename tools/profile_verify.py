"""Profile the banded-verify Pallas kernel: XLA window prep vs DP kernel,
and scaling with candidate count. Run: python tools/profile_verify.py"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _sync(out):
    """block_until_ready does not reliably block through the axon tunnel;
    fetching one element of every output does."""
    import jax
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1] if getattr(leaf, "ndim", 0) else leaf)


def timeit(f, *args, n=3):
    out = f(*args)
    _sync(out)  # compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        _sync(f(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dream_yara_tpu.ops.pallas_verify import banded_verify_pallas
    from dream_yara_tpu.ops.verify import banded_verify

    rng = np.random.default_rng(0)
    n = 4_600_000
    text = jnp.asarray(rng.integers(0, 4, n).astype(np.int8))
    L = 100
    E = 3

    for C in (131072, 262144, 524288):
        reads = jnp.asarray(rng.integers(0, 4, (C, L)).astype(np.int8))
        anchors = jnp.asarray(rng.integers(E, n - L - E, C).astype(np.int32))
        rows = jnp.arange(C, dtype=jnp.int32)
        lens = jnp.full(C, L, dtype=jnp.int32)
        t, _ = timeit(lambda: banded_verify_pallas(
            text, anchors, reads, rows, lens, max_err=E))
        print(f"pallas C={C:7d}: {t*1e3:8.1f}ms  ({C/t/1e6:.1f}M cand/s)")

    # XLA-prep-only variant: windows gather + expand, no kernel
    C = 524288
    reads = jnp.asarray(rng.integers(0, 4, (C, L)).astype(np.int8))
    anchors = jnp.asarray(rng.integers(E, n - L - E, C).astype(np.int32))
    rows = jnp.arange(C, dtype=jnp.int32)
    lens = jnp.full(C, L, dtype=jnp.int32)

    @jax.jit
    def prep_only(text, anchors, reads, read_rows):
        W = 2 * E + 1
        Wp = ((W + 7) // 8) * 8
        WLEN = L + 2 * E
        reads_g = jnp.take(reads, read_rows, axis=0)
        n_wblocks = (WLEN + 127) // 128 + 1
        nb = (n + 127) // 128
        padded = jnp.full(128 + (nb + n_wblocks + 1) * 128, 6, dtype=jnp.int8)
        padded = jax.lax.dynamic_update_slice(padded, text.astype(jnp.int8), (128,))
        tblocks = padded.reshape(-1, 128)
        a0 = anchors - E
        brow = (a0 >> 7) + 1
        rows2 = jnp.concatenate(
            [jnp.take(tblocks, brow + i, axis=0) for i in range(n_wblocks)], axis=1)
        shift = a0 & 127
        for b in range(7):
            k = 1 << b
            rolled = jnp.concatenate([rows2[:, k:], rows2[:, :k]], axis=1)
            rows2 = jnp.where(((shift >> b) & 1)[:, None] == 1, rolled, rows2)
        windows = rows2[:, : WLEN + (Wp - W)]
        wexp = jnp.stack([windows[:, d : d + L] for d in range(Wp)], axis=0)
        wexp = wexp.transpose(2, 0, 1)
        return wexp.sum(), reads_g.sum()

    t, _ = timeit(lambda: prep_only(text, anchors, reads, rows))
    print(f"prep-only C={C}: {t*1e3:8.1f}ms")

    # windows-only (no expand/transpose)
    @jax.jit
    def windows_only(text, anchors, reads, read_rows):
        W = 2 * E + 1
        Wp = ((W + 7) // 8) * 8
        WLEN = L + 2 * E
        reads_g = jnp.take(reads, read_rows, axis=0)
        n_wblocks = (WLEN + 127) // 128 + 1
        nb = (n + 127) // 128
        padded = jnp.full(128 + (nb + n_wblocks + 1) * 128, 6, dtype=jnp.int8)
        padded = jax.lax.dynamic_update_slice(padded, text.astype(jnp.int8), (128,))
        tblocks = padded.reshape(-1, 128)
        a0 = anchors - E
        brow = (a0 >> 7) + 1
        rows2 = jnp.concatenate(
            [jnp.take(tblocks, brow + i, axis=0) for i in range(n_wblocks)], axis=1)
        shift = a0 & 127
        for b in range(7):
            k = 1 << b
            rolled = jnp.concatenate([rows2[:, k:], rows2[:, :k]], axis=1)
            rows2 = jnp.where(((shift >> b) & 1)[:, None] == 1, rolled, rows2)
        windows = rows2[:, : WLEN + (Wp - W)]
        return windows.sum(), reads_g.sum()

    t, _ = timeit(lambda: windows_only(text, anchors, reads, rows))
    print(f"windows-only C={C}: {t*1e3:8.1f}ms")


if __name__ == "__main__":
    main()
