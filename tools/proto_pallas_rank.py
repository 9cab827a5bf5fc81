"""Prototype: Pallas row-fetch strategies vs XLA take() — the FM rank wall.

Both config-1 and config-2 profiles end round 2 device-bound on the fused-rank
row gather (~45-60M indices/s XLA ceiling, cost per INDEX not per byte — see
BASELINE.md / auto-memory perf model). At ~4 GB/s effective that is latency/
issue-bound, nowhere near HBM bandwidth. This microbench measures two kernel
strategies before any product integration (round-3 item 1 in docs/ROADMAP.md):

  * XLA:        jnp.take(fused, idx, axis=0) on (nb, 24) int32
  * Pallas-VMEM: the whole fused table (3-5 MB at 4-6 Mbp bins) RESIDES in
    VMEM; each query is a dynamic vector load. Table passed as (nb, 1, 24)
    — dynamic indexing must ride the untiled leading axis (Mosaic: dynamic
    slices on tiled dims need 8-alignment; same trick as pallas_verify).
  * Pallas-DMA:  table padded to (nb, 128) int32 rows in HBM (`pl.ANY`);
    a ring of NBUF outstanding HBM->VMEM row copies per wave (Mosaic:
    slice lane dim must be a multiple of 128).

Indices are fed per-tile as (1, TILE_Q) SMEM blocks — a whole-array scalar
prefetch of 2^20 int32 blows the 1 MB SMEM budget.

Run on the real chip:  python tools/proto_pallas_rank.py [log2_Q]
Correctness check (CPU interpret mode): DY_PLATFORM=cpu python tools/proto_pallas_rank.py 14
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

TILE_Q = 2048   # queries per program instance
NBUF = 16       # outstanding row DMAs per wave (DMA variant)


# ---------------- variant 1: VMEM-resident table, dynamic loads ------------

UNROLL = 8      # queries per loop iteration (VMEM variant): ILP across loads


def _vmem_kernel(idx_ref, tab_ref, out_ref):
    def body(g, _):
        base = g * UNROLL
        rows = [tab_ref[idx_ref[0, 0, base + u]] for u in range(UNROLL)]
        for u in range(UNROLL):
            out_ref[base + u] = rows[u]
        return _

    jax.lax.fori_loop(0, TILE_Q // UNROLL, body, 0)


def gather_rows_vmem(tab3, idx2, interpret=False):
    """tab3: (nb, 1, W) int32 — whole table lives in VMEM for the kernel.
    idx2: (n_tiles, 1, TILE_Q) int32 (middle singleton: Mosaic requires the
    last two block dims to equal the array dims or be (8,128)-divisible)."""
    n_tiles = idx2.shape[0]
    W = tab3.shape[2]
    out = pl.pallas_call(
        _vmem_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 1, TILE_Q), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(tab3.shape, lambda t: (0, 0, 0))],
        out_specs=pl.BlockSpec((TILE_Q, 1, W), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_Q, 1, W), tab3.dtype),
        interpret=interpret,
    )(idx2, tab3)
    return out[:, 0, :]


# ---------------- variant 2: HBM table, pipelined row DMAs -----------------

def _dma_kernel(idx_ref, tab_ref, out_ref, sems):
    def wave(g, _):
        base = g * NBUF
        for s in range(NBUF):
            i = idx_ref[0, 0, base + s]
            pltpu.make_async_copy(tab_ref.at[i],
                                  out_ref.at[base + s],
                                  sems.at[s]).start()
        for s in range(NBUF):
            i = idx_ref[0, 0, base + s]
            pltpu.make_async_copy(tab_ref.at[i],
                                  out_ref.at[base + s],
                                  sems.at[s]).wait()
        return _

    jax.lax.fori_loop(0, TILE_Q // NBUF, wave, 0)


def gather_rows_dma(tab128, idx2, interpret=False):
    """tab128: (nb, 128) int32 in HBM; rows DMA'd on demand."""
    n_tiles = idx2.shape[0]
    assert TILE_Q % NBUF == 0
    return pl.pallas_call(
        _dma_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 1, TILE_Q), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_Q, 128), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_Q, 128), tab128.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        interpret=interpret,
    )(idx2, tab128)


def main():
    global jax, jnp, pl, pltpu
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if os.environ.get("DY_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DY_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log2_q = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    Q = 1 << log2_q
    nb = 36000                      # config-1 scale: 4.6 Mbp / 128
    rng = np.random.default_rng(0)
    tab = rng.integers(-2**31, 2**31, size=(nb, 24), dtype=np.int64).astype(np.int32)
    tab128 = np.zeros((nb, 128), dtype=np.int32)
    tab128[:, :24] = tab
    tab_j = jnp.asarray(tab)
    tab3_j = jnp.asarray(tab.reshape(nb, 1, 24))
    tab128_j = jnp.asarray(tab128)
    idx = rng.integers(0, nb, size=Q).astype(np.int32)
    idx_j = jnp.asarray(idx)
    idx2_j = jnp.asarray(idx.reshape(-1, 1, TILE_Q))

    interpret = jax.devices()[0].platform == "cpu"
    print(f"[proto] platform={jax.devices()[0].platform} Q={Q} nb={nb} "
          f"interpret={interpret}", file=sys.stderr)

    xla_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    want = np.asarray(xla_take(tab_j, idx_j))
    got_v = np.asarray(gather_rows_vmem(tab3_j, idx2_j, interpret=interpret))
    assert np.array_equal(want, got_v), "vmem gather mismatch"
    got_d = np.asarray(gather_rows_dma(tab128_j, idx2_j, interpret=interpret))
    assert np.array_equal(want, got_d[:, :24]), "dma gather mismatch"
    print("[proto] correctness OK (both variants)", file=sys.stderr)
    if interpret:
        return

    def bench(fn, a, i, name):
        fn(a, i).block_until_ready()    # warm
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            fn(a, i).block_until_ready()
            best = min(best, time.time() - t0)
        print(f"[proto] {name}: {best*1e3:.2f} ms  "
              f"{Q/best/1e6:.1f} M rows/s", file=sys.stderr)
        return Q / best

    r_xla = bench(xla_take, tab_j, idx_j, "XLA take  ")
    r_v = bench(jax.jit(functools.partial(gather_rows_vmem, interpret=False)),
                tab3_j, idx2_j, "pallas vmem")
    r_d = bench(jax.jit(functools.partial(gather_rows_dma, interpret=False)),
                tab128_j, idx2_j, "pallas dma ")
    print(f"[proto] speedup vmem {r_v/r_xla:.2f}x  dma {r_d/r_xla:.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
