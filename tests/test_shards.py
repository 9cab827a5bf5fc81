"""Idempotent output shards + crash-safe resume (SURVEY §5.3, io/shards.py)."""

import json

import numpy as np
import pytest

from dream_yara_tpu.cli import build_filter, indexer, mapper_cli
from dream_yara_tpu.io.fasta import write_fasta
from dream_yara_tpu.io.shards import ShardedSamWriter, skip_reads
from dream_yara_tpu.utils.alphabet import decode
from tests.conftest import random_text


def _no_pg(sam: str) -> str:
    """Drop the @PG line (it embeds the exact command line, which differs
    between the plain and sharded invocations by construction)."""
    return "\n".join(l for l in sam.splitlines() if not l.startswith("@PG"))


def test_writer_idempotent_resume(tmp_path):
    d = tmp_path / "shards"
    w = ShardedSamWriter(d)
    w.write_header("@HD\tVN:1.6\n")
    assert w.write_batch(0, b"r0\t...\n", 10)
    assert w.write_batch(1, b"r1\t...\n", 10)
    # crash + restart: a fresh writer resumes from the manifest
    w2 = ShardedSamWriter(d)
    assert w2.done_batches == 2 and w2.reads_done == 20
    w2.write_header("@HD\tVN:1.6\n")       # idempotent
    assert not w2.write_batch(1, b"DIFFERENT\n", 10)   # already committed
    assert w2.write_batch(2, b"r2\t...\n", 5)
    assert w2.finalize(None) == b"@HD\tVN:1.6\nr0\t...\nr1\t...\nr2\t...\n"
    # a different header means a different run: refuse
    with pytest.raises(RuntimeError):
        ShardedSamWriter(d).write_header("@HD\tVN:1.5\n")


def test_skip_reads_alignment():
    class B:
        def __init__(self, n):
            self.n_reads = n

    it = skip_reads([B(4), B(4), B(2)], 8)
    assert next(it).n_reads == 2
    with pytest.raises(RuntimeError):
        skip_reads([B(4), B(4)], 6)        # boundary mismatch -> refuse


@pytest.fixture
def toy(tmp_path, rng):
    genomes = [random_text(rng, 5000) for _ in range(2)]
    bin_dir = tmp_path / "fa"
    bin_dir.mkdir()
    for b, g in enumerate(genomes):
        write_fasta(bin_dir / f"bin{b}.fa", [f"g{b}"], [g])
    db = tmp_path / "db"
    indexer.main(["--bins-dir", str(bin_dir), "-o", str(db)])
    build_filter.main(["--bins-dir", str(bin_dir), "-o", str(db),
                       "-bs", "4m", "-k", "19"])
    return tmp_path, genomes, db


def _write_fq(path, genomes, rng, n):
    with open(path, "wb") as fh:
        for i in range(n):
            b = i % 2
            p = int(rng.integers(0, 4900))
            fh.write(b"@r%d\n" % i + decode(genomes[b][p : p + 100]).encode()
                     + b"\n+\n" + b"I" * 100 + b"\n")


def test_cli_sharded_equals_plain(toy, rng):
    tmp_path, genomes, db = toy
    fq = tmp_path / "reads.fq"
    _write_fq(fq, genomes, rng, 24)
    plain = tmp_path / "plain.sam"
    mapper_cli.main([str(db), str(fq), "-o", str(plain), "-e", "0.03",
                     "-rb", "8"])
    sharded = tmp_path / "sharded.sam"
    mapper_cli.main([str(db), str(fq), "-o", str(sharded), "-e", "0.03",
                     "-rb", "8", "--output-shards", str(tmp_path / "sh")])
    # shard files + manifest landed; final output byte-identical
    man = json.loads((tmp_path / "sh" / "manifest.json").read_text())
    assert len(man["shards"]) == 3 and man["reads_done"] == 24
    assert _no_pg(sharded.read_text()) == _no_pg(plain.read_text())


def test_cli_sharded_resume_skips_done_batches(toy, rng):
    """Interrupted run = only the first portion of the input was committed;
    re-running the full command completes WITHOUT re-mapping shard 0 and the
    assembled output equals an uninterrupted run."""
    tmp_path, genomes, db = toy
    fq_half = tmp_path / "half.fq"
    fq_full = tmp_path / "full.fq"
    r1 = np.random.default_rng(9)
    _write_fq(fq_full, genomes, r1, 16)
    fq_half.write_bytes(b"".join(
        fq_full.read_bytes().splitlines(keepends=True)[: 8 * 4]))

    sh = tmp_path / "sh"
    out = tmp_path / "resumed.sam"
    # "crash" after the first batch: map only the first 8 reads
    mapper_cli.main([str(db), str(fq_half), "-o", str(out), "-e", "0.03",
                     "-rb", "8", "--output-shards", str(sh)])
    shard0 = (sh / "shard_000000.sam").read_bytes()
    # resume with the full input: shard 0 must be reused byte-for-byte
    mapper_cli.main([str(db), str(fq_full), "-o", str(out), "-e", "0.03",
                     "-rb", "8", "--output-shards", str(sh)])
    assert (sh / "shard_000000.sam").read_bytes() == shard0
    plain = tmp_path / "plain.sam"
    mapper_cli.main([str(db), str(fq_full), "-o", str(plain), "-e", "0.03",
                     "-rb", "8"])
    assert _no_pg(out.read_text()) == _no_pg(plain.read_text())
