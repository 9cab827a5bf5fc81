"""Attribute the flat-step classify cost (1.28s of the 1.92s step at
config-2 shapes): blob unpack + rc reconstruction vs window hashing vs
filter gathers vs bit unpack/count.

Run: python tools/proto_classify_cost.py [n_reads]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_config2 import build_or_load, make_pairs
    from dream_yara_tpu.ops.ibf_query import (_count_rows_blocked, _fmix32,
                                              classify_thresholds,
                                              kmer_windows_dev)
    from dream_yara_tpu.index.hashing import MIX_MULT
    from dream_yara_tpu.ops.readpack import (pack_blob_with_lengths,
                                             unpack_blob, unpack_reads)

    n = (int(sys.argv[1]) if len(sys.argv) > 1 else 250_000)
    genomes, index = build_or_load()
    rng = np.random.default_rng(7)
    batch = make_pairs(genomes, index.stores, n // 2, rng)
    L = batch.max_len
    half = batch.n_reads
    filt = index.filter
    B = index.n_bins
    k, nh = filt.k, filt.n_hashes
    fw = jnp.asarray(np.asarray(filt.words))
    blob = jnp.asarray(pack_blob_with_lengths(
        batch.seqs[:half], batch.lengths, half, L))
    print(f"[pcc] n={half} L={L} k={k} nh={nh} filter_rows={filt.words.shape}",
          file=sys.stderr)

    def s_unpack(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        return reads.astype(jnp.int32).sum()

    def s_unpack_fwd(fw_, blob_):
        # fwd rows only — no rc log-roll (what classify actually needs)
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        sh2 = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
        chars = ((packed[:, :, None] >> sh2) & 3).reshape(half, -1)[:, :L]
        sh1 = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        isn = ((nmask[:, :, None] >> sh1) & 1).reshape(half, -1)[:, :L]
        j = jnp.arange(L, dtype=jnp.int32)[None, :]
        fwd = jnp.where((isn == 1) | (j >= lengths[:, None]),
                        jnp.uint32(4), chars).astype(jnp.int8)
        return fwd.astype(jnp.int32).sum()

    def s_windows(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        lo, hi, valid = kmer_windows_dev(reads[:half], lengths, k,
                                         canonical=True)
        mix = lo ^ (hi * jnp.uint32(MIX_MULT))
        return (mix & 0xFF).astype(jnp.int32).sum() + valid.sum()

    def s_full(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        lo, hi, valid = kmer_windows_dev(reads[:half], lengths, k,
                                         canonical=True)
        mix = lo ^ (hi * jnp.uint32(MIX_MULT))
        counts = _count_rows_blocked(fw_, mix.reshape(-1), valid, nh,
                                     max(1, (B + 31) // 32))
        return counts.reshape(half, -1).sum()

    def timed(fn, name):
        f = jax.jit(fn)
        t0 = time.time()
        _ = np.asarray(f(fw, blob))
        print(f"[pcc] {name}: compile+1st {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = np.asarray(f(fw, blob))
            ts.append(time.time() - t0)
        print(f"[pcc] {name}: {sorted(ts)[1]*1e3:8.1f} ms", file=sys.stderr)

    timed(s_unpack_fwd, "unpack fwd only    ")
    timed(s_unpack, "unpack fwd+rc      ")
    timed(s_windows, "+windows/hash      ")
    timed(s_full, "+gather/count FULL ")


def variant_blockrow():
    """Measure: ONE block-row gather per window + on-VPU probe select,
    vs the 3-single-word-gather baseline (index-rate-bound at ~83M idx/s)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_config2 import build_or_load, make_pairs
    from dream_yara_tpu.index.hashing import BLOCK_WORDS, HASH_SEEDS, MIX_MULT
    from dream_yara_tpu.ops.ibf_query import _fmix32, kmer_windows_dev
    from dream_yara_tpu.ops.readpack import (pack_blob_with_lengths,
                                             unpack_blob, unpack_reads)

    n = (int(sys.argv[2]) if len(sys.argv) > 2 else 250_000)
    genomes, index = build_or_load()
    rng = np.random.default_rng(7)
    batch = make_pairs(genomes, index.stores, n // 2, rng)
    L = batch.max_len
    half = batch.n_reads
    filt = index.filter
    B = index.n_bins
    k, nh = filt.k, filt.n_hashes
    fw = jnp.asarray(np.asarray(filt.words))
    blob = jnp.asarray(pack_blob_with_lengths(
        batch.seqs[:half], batch.lengths, half, L))
    n_rows, Wd = filt.words.shape
    S = BLOCK_WORDS // Wd
    n_blocks = n_rows // S
    wdc = max(1, (B + 31) // 32)
    CH = 16  # read chunks

    def s_blockrow(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        lo, hi, valid = kmer_windows_dev(reads[:half], lengths, k,
                                         canonical=True)
        mix = lo ^ (hi * jnp.uint32(MIX_MULT))
        m = mix.shape[1]
        rows = fw_[:, :wdc].reshape(n_blocks, S * wdc)
        rc = half // CH

        def one_chunk(args):
            mixc, vc = args                          # (rc, m)
            mixf = mixc.reshape(-1)
            v0 = _fmix32(mixf ^ jnp.uint32(HASH_SEEDS[0]))
            block = ((v0 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
                     % jnp.int32(n_blocks))
            v1 = _fmix32(mixf ^ jnp.uint32(HASH_SEEDS[1]))
            base = v1 & jnp.uint32(S - 1)
            stride = ((v1 >> jnp.uint32(8)) & jnp.uint32(S - 1)) | jnp.uint32(1)
            br = jnp.take(rows, block, axis=0)       # (rc*m, S*wdc)
            anded = None
            iota = jnp.arange(S * wdc, dtype=jnp.uint32)[None, :]
            for j in range(nh):
                pj = (base + jnp.uint32(j) * stride) & jnp.uint32(S - 1)
                sel = (iota // jnp.uint32(wdc)) == pj[:, None]
                gw = jnp.where(sel, br, jnp.uint32(0))
                gw = gw.reshape(-1, S, wdc).sum(axis=1, dtype=jnp.uint32)
                anded = gw if anded is None else (anded & gw)
            anded = jnp.where(vc.reshape(-1)[:, None], anded, jnp.uint32(0))
            shifts = jnp.arange(32, dtype=jnp.uint32)
            bits = ((anded[:, :, None] >> shifts) & 1).astype(jnp.int32)
            return bits.reshape(rc, m, wdc * 32).sum(axis=1)

        counts = jax.lax.map(one_chunk,
                             (mix.reshape(CH, rc, m), valid.reshape(CH, rc, m)))
        return counts.reshape(half, -1).sum()

    def timed(fn, name):
        f = jax.jit(fn)
        t0 = time.time()
        r0 = np.asarray(f(fw, blob))
        print(f"[pcc] {name}: compile+1st {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = np.asarray(f(fw, blob))
            ts.append(time.time() - t0)
        print(f"[pcc] {name}: {sorted(ts)[1]*1e3:8.1f} ms  (checksum {r0})",
              file=sys.stderr)

    # checksum cross-check vs the production counts
    from dream_yara_tpu.ops.ibf_query import _count_rows_blocked

    def s_full(fw_, blob_):
        packed, nmask, lengths = unpack_blob(blob_, half, L)
        reads = unpack_reads(packed, nmask, lengths, L)
        lo, hi, valid = kmer_windows_dev(reads[:half], lengths, k,
                                         canonical=True)
        mix = lo ^ (hi * jnp.uint32(MIX_MULT))
        counts = _count_rows_blocked(fw_, mix.reshape(-1), valid, nh, wdc)
        return counts.reshape(half, -1).sum()

    timed(s_full, "baseline 3-gather  ")
    timed(s_blockrow, "blockrow+onehot    ")


def variant_count():
    """A/B the per-bin COUNT stage (bit unpack + sum over the window axis),
    holding the gather+select stage fixed:

      base   — (c*M, wdc, 32) int32 unpack, sum over M (production today)
      int8   — same but int8 bit tensor (4x smaller materialization)
      csa    — carry-save vertical counters: M-loop of ~2P uint32 ops on
               (c, wdc) planes, ONE P-plane unpack at the end (no (c*M,
               wdc, 32) tensor at all)
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_config2 import build_or_load, make_pairs
    from dream_yara_tpu.index.hashing import BLOCK_WORDS, HASH_SEEDS, MIX_MULT
    from dream_yara_tpu.ops.ibf_query import _fmix32, kmer_windows_dev
    from dream_yara_tpu.ops.readpack import (pack_blob_with_lengths,
                                             unpack_blob, unpack_fwd)

    n = (int(sys.argv[2]) if len(sys.argv) > 2 else 250_000)
    genomes, index = build_or_load()
    rng = np.random.default_rng(7)
    batch = make_pairs(genomes, index.stores, n // 2, rng)
    L = batch.max_len
    half = batch.n_reads
    filt = index.filter
    B = index.n_bins
    k, nh = filt.k, filt.n_hashes
    fw = jnp.asarray(np.asarray(filt.words))
    blob = jnp.asarray(pack_blob_with_lengths(
        batch.seqs[:half], batch.lengths, half, L))
    n_rows, Wd = filt.words.shape
    S = BLOCK_WORDS // Wd
    n_blocks = n_rows // S
    wdc = max(1, (B + 31) // 32)
    CH = 16

    def anded_of(mixc, vc):
        """gather + one-hot probe select + AND (shared by all variants)."""
        mixf = mixc.reshape(-1)
        v0 = _fmix32(mixf ^ jnp.uint32(HASH_SEEDS[0]))
        block = ((v0 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
                 % jnp.int32(n_blocks))
        v1 = _fmix32(mixf ^ jnp.uint32(HASH_SEEDS[1]))
        base = v1 & jnp.uint32(S - 1)
        stride = ((v1 >> jnp.uint32(8)) & jnp.uint32(S - 1)) | jnp.uint32(1)
        rows = fw[:, :wdc].reshape(n_blocks, S * wdc)
        br = jnp.take(rows, block, axis=0)
        anded = None
        iota = jnp.arange(S * wdc, dtype=jnp.uint32)[None, :]
        for j in range(nh):
            pj = (base + jnp.uint32(j) * stride) & jnp.uint32(S - 1)
            sel = (iota // jnp.uint32(wdc)) == pj[:, None]
            gw = jnp.where(sel, br, jnp.uint32(0))
            gw = gw.reshape(-1, S, wdc).sum(axis=1, dtype=jnp.uint32)
            anded = gw if anded is None else (anded & gw)
        return jnp.where(vc.reshape(-1)[:, None], anded, jnp.uint32(0))

    def mk(count_fn):
        def run(fw_, blob_):
            packed, nmask, lengths = unpack_blob(blob_, half, L)
            fwd = unpack_fwd(packed, nmask, lengths, L)
            lo, hi, valid = kmer_windows_dev(fwd, lengths, k, canonical=True)
            mix = lo ^ (hi * jnp.uint32(MIX_MULT))
            m = mix.shape[1]
            rc = half // CH

            def one_chunk(args):
                mixc, vc = args
                anded = anded_of(mixc, vc)               # (rc*m, wdc)
                return count_fn(anded, rc, m)            # (rc, wdc*32)

            counts = jax.lax.map(
                one_chunk, (mix.reshape(CH, rc, m), valid.reshape(CH, rc, m)))
            return counts.reshape(half, -1).sum()
        return run

    shifts = jnp.arange(32, dtype=jnp.uint32)

    def c_base(anded, rc, m):
        bits = ((anded[:, :, None] >> shifts) & 1).astype(jnp.int32)
        return bits.reshape(rc, m, wdc * 32).sum(axis=1)

    def c_int8(anded, rc, m):
        bits = ((anded[:, :, None] >> shifts) & 1).astype(jnp.int8)
        return bits.reshape(rc, m, wdc * 32).sum(axis=1, dtype=jnp.int32)

    def c_csa(anded, rc, m):
        a3 = anded.reshape(rc, m, wdc)
        P = max(1, (m + 1).bit_length())
        planes = [jnp.zeros((rc, wdc), jnp.uint32) for _ in range(P)]
        for t in range(m):
            carry = a3[:, t, :]
            for p in range(P):
                nxt = planes[p] & carry
                planes[p] = planes[p] ^ carry
                carry = nxt
        out = jnp.zeros((rc, wdc, 32), jnp.int32)
        for p in range(P):
            out = out + (((planes[p][:, :, None] >> shifts) & 1)
                         << jnp.uint32(p)).astype(jnp.int32)
        return out.reshape(rc, wdc * 32)

    def timed(fn, name):
        f = jax.jit(mk(fn))
        t0 = time.time()
        r0 = np.asarray(f(fw, blob))
        print(f"[pcc] {name}: compile+1st {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = np.asarray(f(fw, blob))
            ts.append(time.time() - t0)
        print(f"[pcc] {name}: {sorted(ts)[1]*1e3:8.1f} ms (checksum {r0})",
              file=sys.stderr)

    timed(c_base, "count int32 (prod) ")
    timed(c_int8, "count int8         ")
    timed(c_csa, "count CSA planes   ")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "blockrow":
        variant_blockrow()
    elif len(sys.argv) > 1 and sys.argv[1] == "count":
        variant_count()
    else:
        main()
