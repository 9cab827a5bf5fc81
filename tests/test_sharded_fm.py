"""Mesh-sharded big-bin FM index (SURVEY §5.7) == single-device BinMapper.

A bin whose tables are split over a 'shard' mesh axis (K = 1/2/4/8 virtual
CPU devices) must produce the exact same match set as the single-device map
step — the masked-gather + psum row fetches assemble identical table rows,
and all other compute is replicated."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from dream_yara_tpu.index.fmindex import FMIndex
from dream_yara_tpu.io.readstore import ReadBatch
from dream_yara_tpu.io.seqstore import SeqStore
from dream_yara_tpu.parallel.sharded_fm import ShardedBinMapper
from dream_yara_tpu.pipeline.mapper import BinMapper
from dream_yara_tpu.utils.alphabet import revcomp
from dream_yara_tpu.utils.options import MapperOptions
from tests.conftest import mutate, random_text


def _key(m):
    return sorted(zip(m.read_id.tolist(), m.strand.tolist(),
                      m.begin.tolist(), m.end.tolist(), m.dist.tolist()))


@pytest.fixture(scope="module")
def db_and_batch():
    rng = np.random.default_rng(77)
    text = random_text(rng, 9000)
    # a tandem repeat region so some seeds overflow capacity (exercises the
    # host expansion path)
    text[3000:3600] = np.tile(text[3000:3030], 20)
    text[-1] = 5
    store = SeqStore.from_seqs(["big"], [text])
    fm = FMIndex.build(store.text)

    names, reads = [], []
    for i in range(40):
        p = int(rng.integers(0, 8900))
        r = mutate(rng, store.text[p : p + 100].copy(), n_sub=2)
        if i % 2:
            r = revcomp(r)
        names.append(f"r{i}")
        reads.append(r)
    batch = ReadBatch.from_reads(names, reads)
    return store, fm, batch


def _want(store, fm, batch, opts):
    m = BinMapper(store, fm, opts).map_batch(batch)
    return _key(m)


@pytest.mark.parametrize("K", [1, 2, 4, 8])
def test_sharded_equals_single_device(db_and_batch, K):
    store, fm, batch = db_and_batch
    opts = MapperOptions(sensitivity="full")
    devs = np.array(jax.devices()[:K])
    mesh = Mesh(devs, ("shard",))
    sm = ShardedBinMapper(fm, store.text, mesh, opts=opts)
    got = _key(sm.map_batch(batch))
    assert got == _want(store, fm, batch, opts)


def test_sharded_hbm_fraction(db_and_batch):
    """Per-device table bytes shrink ~1/K (the point of §5.7)."""
    store, fm, batch = db_and_batch
    from dream_yara_tpu.parallel.sharded_fm import build_sharded_db

    b1 = build_sharded_db(fm, store.text, 1)
    b8 = build_sharded_db(fm, store.text, 8)
    per_dev = lambda db: sum(a.nbytes // db.K for a in
                             (db.fused, db.sa8, db.tb)
                             ) + (db.pfx2.nbytes // db.K if db.pfx2 is not None
                                  else 0)
    assert per_dev(b8) <= per_dev(b1) / 8 + 4096
