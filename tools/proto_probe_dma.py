"""Prototype: rotating-ring DMA row gather vs XLA take at BIG-table scale.

Round-4 state: classify (0.62s) and seed search (0.79s) per 250k c3 reads
are both random-row gathers from multi-GiB HBM tables (3 GiB blocked IBF,
~2 GiB stacked fused-rank rows). The round-3 small-table measurement (XLA
385M idx/s, Pallas DMA ring 0.57x) does NOT transfer: a small table is
served from VMEM-resident fusions, a 3 GiB one pays per-index HBM latency.

MEASURED (2026-08-20, 1x v5e, 3 GiB table, Q=2M, median-of-5, timed by
host round trip of a checksum — block_until_ready returns at dispatch on
the axon tunnel):
    xla take   46-52 ms   ~40 M rows/s   ~20 GiB/s
    ring 32    88 ms      22.7 M rows/s  (simple loop body)
    ring 64    71 ms      28.3 M rows/s  (8x-unrolled body)   => 0.66x
CLOSED: the ring is scalar-core ISSUE-RATE bound (~35 ns per wait+start
even unrolled), while XLA's gather engine retires a 512 B row every
~23 ns. ~20 GiB/s is the per-index random-fetch floor either way; there
is no Pallas win on these gathers. The remaining classify/search levers
are algorithmic (fewer indices), not kernels.

This measures, on a table sized like the config-3 blocked IBF:
  xla   — jnp.take(rows, idx, axis=0) on (n_blocks, 128) uint32
  ring  — Pallas kernel, table in ANY/HBM, NBUF rotating outstanding
          512 B row DMAs (issue query i+NBUF right after waiting query i —
          the round-3 proto's ring was wave-synchronous, max NBUF/2 avg
          in flight; this one keeps NBUF in flight continuously)

python tools/proto_probe_dma.py [Q=1000000] [table_mib=1536] [nbuf=32]
Correctness: DY_PLATFORM=cpu python tools/proto_probe_dma.py 8192 1 8
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

TILE_Q = 2048


def _bind_jax():
    """Bind jax/pallas module globals lazily, honoring DY_PLATFORM BEFORE
    the first jax import (the round-4 layout bound them only inside main(),
    so importing this module and calling the gather directly raised
    NameError)."""
    global jax, jnp, pl, pltpu
    if "jax" in globals():
        return
    if os.environ.get("DY_PLATFORM"):
        os.environ.setdefault("JAX_PLATFORMS", os.environ["DY_PLATFORM"])
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    globals().update(jax=jax, jnp=jnp, pl=pl, pltpu=pltpu)


def _ring_kernel(nbuf, idx_ref, tab_ref, out_ref, sems):
    def cp(i):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[0, 0, i]], out_ref.at[i],
            sems.at[jax.lax.rem(i, nbuf)])

    for s in range(nbuf):                      # prologue: fill the ring
        cp(s).start()

    U = 8                                      # scalar-core issue rate is the
                                               # wall: unroll the loop body
                                               # (nbuf validated in
                                               # gather_rows_ring)

    def body(g, _):
        for u in range(U):
            i = g * U + u
            cp(i).wait()                       # retire query i ...
            cp(i + nbuf).start()               # ... its slot issues i+nbuf
        return _

    jax.lax.fori_loop(0, (TILE_Q - nbuf) // U, body, 0)

    def epi(i, _):
        cp(i).wait()
        return _

    jax.lax.fori_loop(TILE_Q - nbuf, TILE_Q, epi, 0)


def gather_rows_ring(tab, idx2, nbuf=32, interpret=False):
    """tab: (n_blocks, 128) uint32 in HBM; idx2: (n_tiles, 1, TILE_Q)."""
    _bind_jax()
    if (TILE_Q - nbuf) % 8 != 0:
        raise ValueError(
            f"nbuf must be a multiple of 8 (the kernel's unroll factor "
            f"divides TILE_Q - nbuf = {TILE_Q} - {nbuf}); got nbuf={nbuf}")
    n_tiles = idx2.shape[0]
    W = tab.shape[1]
    return pl.pallas_call(
        functools.partial(_ring_kernel, nbuf),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 1, TILE_Q), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_Q, W), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_Q, W), tab.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
        interpret=interpret,
    )(idx2, tab)


def main():
    _bind_jax()

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mib = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    nbuf = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    Q = -(-Q // TILE_Q) * TILE_Q
    W = 128
    n_blocks = max(64, (mib << 20) // (W * 4))
    rng = np.random.default_rng(0)
    tab_np = rng.integers(0, 1 << 32, (n_blocks, W), dtype=np.uint32)
    idx_np = rng.integers(0, n_blocks, Q).astype(np.int32)
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(idx_np)
    idx2 = jnp.asarray(idx_np.reshape(-1, 1, TILE_Q))
    interpret = jax.devices()[0].platform == "cpu"
    print(f"[probe-dma] platform={jax.devices()[0].platform} Q={Q} "
          f"n_blocks={n_blocks} ({n_blocks*W*4>>20} MiB) nbuf={nbuf}",
          file=sys.stderr)

    # reduce to ONE scalar fetched to host per run: on the axon tunnel
    # block_until_ready returns at dispatch, so the only honest clock is the
    # host round trip of a value that depends on every gathered row
    xla_take = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0).sum(dtype=jnp.uint32))
    ring = jax.jit(lambda t, i: functools.partial(
        gather_rows_ring, nbuf=nbuf, interpret=interpret)(t, i)
        .sum(dtype=jnp.uint32))
    if interpret or n_blocks * W * 4 < (64 << 20):
        want = int(np.asarray(xla_take(tab, idx)))
        got = int(np.asarray(ring(tab, idx2)))
        assert want == got, "ring gather checksum mismatch"
        print("[probe-dma] correctness OK", file=sys.stderr)
    if interpret:
        return

    def bench(fn, i_arg, name):
        chk = int(np.asarray(fn(tab, i_arg)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            chk = int(np.asarray(fn(tab, i_arg)))
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        print(f"[probe-dma] {name}: {med*1e3:8.2f} ms  "
              f"{Q/med/1e6:7.1f} M rows/s  "
              f"{Q*W*4/med/2**30:6.1f} GiB/s", file=sys.stderr)
        return Q / med

    r_x = bench(xla_take, idx, "xla take")
    r_r = bench(ring, idx2, f"ring{nbuf:3d} ")
    print(f"[probe-dma] ring/xla = {r_r/r_x:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
