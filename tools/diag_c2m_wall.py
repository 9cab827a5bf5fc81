"""Wall-clock attribution for one config-2 mesh batch: where do the
~11 untimed seconds go?  (bench_config2_mesh stage sum 12.6s vs wall 25.3s)

Run: python tools/diag_c2m_wall.py [n_pairs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from bench_config2 import LD, LL, build_or_load, make_pairs  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dream_yara_tpu.parallel.dream_mesh import (MeshDreamMapper,
                                                    mesh_dream_sam)
    from dream_yara_tpu.pipeline.dis_mapper import _finish_batch
    from dream_yara_tpu.utils.options import MapperOptions
    from dream_yara_tpu.utils.timer import StageTimers

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000
    genomes, index = build_or_load()
    opts = MapperOptions(error_rate=0.03, library_length=LL,
                         library_deviation=LD, secondary_matches="tag")
    rng = np.random.default_rng(7)
    mapper = MeshDreamMapper(index, opts, n_devices=1)

    batch = make_pairs(genomes, index.stores, n_pairs, rng)
    # warmup (compile)
    mesh_dream_sam(mapper, batch, header=False)

    batch = make_pairs(genomes, index.stores, n_pairs, rng)
    timers = StageTimers()
    W = time.time()
    t0 = time.time()
    drain = mapper.map_batch_async(batch, timers)
    t_dispatch = time.time() - t0
    t0 = time.time()
    m = drain()
    t_drain = time.time() - t0
    t0 = time.time()
    sam = _finish_batch(index, batch, m, opts, "", timers, False, None)
    t_finish = time.time() - t0
    t0 = time.time()
    n_rec = sum(1 for l in sam.splitlines() if l and not l.startswith(b"@"))
    t_count = time.time() - t0
    wall = time.time() - W
    print(timers.report(), file=sys.stderr)
    print(f"[wall] dispatch={t_dispatch:.2f}s drain={t_drain:.2f}s "
          f"finish={t_finish:.2f}s count={t_count:.2f}s "
          f"total={wall:.2f}s records={n_rec}", file=sys.stderr)
    ssum = round(sum(timers.totals.values()), 2)
    print(f"[wall] stage-sum={ssum}", file=sys.stderr)


if __name__ == "__main__":
    main()
