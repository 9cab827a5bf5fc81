"""Mesh-sharded mapping on the virtual 8-device CPU mesh (SURVEY.md §4.3):
same inputs, different mesh shapes -> identical match sets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.ops.device_index import DeviceFMSet
from dream_yara_tpu.parallel.dist_mapper import (
    build_dist_map_step, shard_db, shard_reads,
)
from dream_yara_tpu.parallel.mesh import make_mesh, mesh_factors
from dream_yara_tpu.pipeline.map_step import max_seed_len_static
from dream_yara_tpu.pipeline.seeding import rate_to_ppm
from dream_yara_tpu.utils.alphabet import revcomp
from tests.conftest import mutate, random_text


def test_mesh_factors():
    assert mesh_factors(8, 4) == (2, 4)
    assert mesh_factors(8, 64) == (1, 8)
    assert mesh_factors(8, 1) == (8, 1)
    assert mesh_factors(4, 3) == (4 // 2, 2) or mesh_factors(4, 3)[1] <= 3


@pytest.fixture(scope="module")
def db_and_reads():
    rng = np.random.default_rng(31)
    B = 4
    genomes = [random_text(rng, 4000) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text) for st in stores]
    fmset = DeviceFMSet.from_host(fms, [st.text for st in stores])
    bin_starts = np.zeros(B, dtype=np.int32)
    off = 0
    for b, st in enumerate(stores):
        bin_starts[b] = off
        off += len(st.text)

    n = 16
    names, reads, truth = [], [], []
    for i in range(n):
        b = i % B
        p = int(rng.integers(0, 3900))
        r = mutate(rng, genomes[b][p : p + 80].copy(), n_sub=1)
        if i % 2:
            r = revcomp(r)
        names.append(f"r{i}")
        reads.append(r)
        truth.append((b, p, i % 2))
    batch = ReadBatch.from_reads(names, reads)
    return fmset, bin_starts, batch, truth, B


def run_mesh(fmset, bin_starts, batch, B, n_devices):
    mesh = make_mesh(n_devices, n_bins=B)
    n_data = mesh.shape["data"]
    rate_ppm = rate_to_ppm(0.03)
    max_err = 2
    max_slen = max_seed_len_static(batch.max_len, rate_ppm)
    step = build_dist_map_step(mesh, rate_ppm=rate_ppm, max_errors=max_err,
                               capacity=4, max_slen=max_slen)
    seqs, lengths = shard_reads(batch.seqs, batch.lengths, n_data)
    fmset_sh, bs_sh = shard_db(mesh, fmset, jnp.asarray(bin_starts))
    routing = np.ones((batch.n_reads, B), dtype=bool)
    out = step(fmset_sh, bs_sh, jnp.asarray(seqs), jnp.asarray(lengths),
               jnp.asarray(routing))
    ok = np.asarray(out.ok).reshape(-1)
    res = set()
    for f in ["read_id", "strand", "begin", "end", "dist"]:
        pass
    rid = np.asarray(out.read_id).reshape(-1)[ok]
    strand = np.asarray(out.strand).reshape(-1)[ok]
    beg = np.asarray(out.begin).reshape(-1)[ok]
    end = np.asarray(out.end).reshape(-1)[ok]
    dist = np.asarray(out.dist).reshape(-1)[ok]
    return set(zip(rid.tolist(), strand.tolist(), beg.tolist(),
                   end.tolist(), dist.tolist()))


def test_dist_map_finds_planted(db_and_reads):
    fmset, bin_starts, batch, truth, B = db_and_reads
    found = run_mesh(fmset, bin_starts, batch, B, n_devices=8)
    for rid, (b, p, strand) in enumerate(truth):
        glob = int(bin_starts[b]) + p
        assert any(r == rid and s == strand and bg == glob and d <= 1
                   for (r, s, bg, e, d) in found), f"read {rid}"


def test_mesh_shape_invariance(db_and_reads):
    """1, 2, 4, 8 devices -> identical match sets (determinism contract)."""
    fmset, bin_starts, batch, truth, B = db_and_reads
    ref = run_mesh(fmset, bin_starts, batch, B, n_devices=1)
    for nd in (2, 4, 8):
        assert run_mesh(fmset, bin_starts, batch, B, nd) == ref


def test_routing_mask_respected(db_and_reads):
    """Reads masked out of a bin produce no matches there."""
    fmset, bin_starts, batch, truth, B = db_and_reads
    mesh = make_mesh(8, n_bins=B)
    rate_ppm = rate_to_ppm(0.03)
    max_slen = max_seed_len_static(batch.max_len, rate_ppm)
    step = build_dist_map_step(mesh, rate_ppm=rate_ppm, max_errors=2,
                               capacity=4, max_slen=max_slen)
    seqs, lengths = shard_reads(batch.seqs, batch.lengths, mesh.shape["data"])
    fmset_sh, bs_sh = shard_db(mesh, fmset, jnp.asarray(bin_starts))
    routing = np.zeros((batch.n_reads, B), dtype=bool)  # mask everything
    out = step(fmset_sh, bs_sh, jnp.asarray(seqs), jnp.asarray(lengths),
               jnp.asarray(routing))
    assert not np.asarray(out.ok).any()
