"""Multi-host validation (SURVEY.md §5.8, BASELINE config 3): 2 jax
processes x 4 virtual CPU devices each, per-process bin-shard loading,
cross-host merge — SAM byte-identical to the single-process pipeline."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.index.ibf import InterleavedBloomFilter
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.pipeline.dis_mapper import DreamIndex, dream_map_sam
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text

REPO = Path(__file__).parent.parent


def _write_db(tmp, rng, B=4, glen=5000, sample_rate=1):
    import json

    genomes = [random_text(rng, glen) for _ in range(B)]
    stores = [SeqStore.from_seqs([f"g{b}"], [genomes[b]]) for b in range(B)]
    fms = [FMIndex.build(st.text, sample_rate=sample_rate) for st in stores]
    filt = InterleavedBloomFilter.create(B, size_bits=1 << 22, n_hashes=3, k=19)
    (tmp / "db" / "bins").mkdir(parents=True)
    for b in range(B):
        stores[b].save(tmp / "db" / "bins" / f"{b:04d}.store.npz")
        fms[b].save(tmp / "db" / "bins" / f"{b:04d}.fm.npz")
        filt.add_kmers(genomes[b], b)
    filt.save(tmp / "db" / "db.filter")
    (tmp / "db" / "meta.json").write_text(json.dumps({"n_bins": B}))
    return genomes, DreamIndex(stores, fms, filt, "bloom")


def _write_fastq(path, names, reads):
    with open(path, "w") as f:
        for nm, r in zip(names, reads):
            s = "".join("ACGTN"[c] for c in r)
            f.write(f"@{nm}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.mark.slow
def test_two_process_sam_identical(tmp_path):
    rng = np.random.default_rng(42)
    genomes, index = _write_db(tmp_path, rng)
    names, reads = [], []
    for b, g in enumerate(genomes):
        for i in range(5):
            p = int(rng.integers(0, len(g) - 100))
            r = mutate(rng, g[p : p + 100].copy(), n_sub=1)
            if (b + i) % 2:
                r = revcomp(r)
            names.append(f"b{b}r{i}")
            reads.append(r)
    _write_fastq(tmp_path / "reads.fq", names, reads)

    # reference: single-process DREAM pipeline on the same DB
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts, cmdline="multihost_demo")

    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    # the image's sitecustomize registers the axon TPU plugin (and touches
    # the XLA backend) at interpreter start; CPU subprocesses must skip it
    # or jax.distributed.initialize() comes too late
    env.pop("PALLAS_AXON_POOL_IPS", None)
    port = 12397
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
             str(pid), "2", str(port), str(tmp_path / "db"),
             str(tmp_path / "reads.fq"), str(tmp_path / "out.sam")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]
    sam = (tmp_path / "out.sam").read_text()
    assert sam == ref, "2-process SAM differs from single-process"
    # each process really loaded only its own bins
    err0 = outs[0][1].decode()
    err1 = outs[1][1].decode()
    assert "my_bins=[0, 1]" in err0 and "my_bins=[2, 3]" in err1


@pytest.mark.slow
def test_two_process_sampled_sa_identical(tmp_path):
    """Sampled-SA bins (rate 4) across 2 processes: shard shapes derive
    from max_n, so processes with different local bins stay consistent;
    SAM byte-identical to single-process."""
    rng = np.random.default_rng(43)
    genomes, index = _write_db(tmp_path, rng, sample_rate=4)
    names, reads = [], []
    for b, g in enumerate(genomes):
        for i in range(4):
            p = int(rng.integers(0, len(g) - 100))
            r = mutate(rng, g[p : p + 100].copy(), n_sub=1)
            if (b + i) % 2:
                r = revcomp(r)
            names.append(f"b{b}r{i}")
            reads.append(r)
    _write_fastq(tmp_path / "reads.fq", names, reads)
    batch = ReadBatch.from_reads(names, reads)
    opts = MapperOptions(error_rate=0.03)
    ref = dream_map_sam(index, batch, opts, cmdline="multihost_demo")

    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    port = 12431
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
             str(pid), "2", str(port), str(tmp_path / "db"),
             str(tmp_path / "reads.fq"), str(tmp_path / "out.sam")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]
    sam = (tmp_path / "out.sam").read_text()
    assert sam == ref, "2-process sampled-SA SAM differs from single-process"
