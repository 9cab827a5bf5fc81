"""One process of a multi-host DREAM mapping run (CPU validation harness).

Usage (launched once per process, usually by tests/test_multihost.py):
  python tools/multihost_demo.py <pid> <nprocs> <port> <db_dir> <reads.fq> \
      <out.sam> [reads2.fq] [--batch-size N] [--shards DIR]
      [--crash-after K] [--crash-pid P] [--sm MODE] [-s N]

Each process owns n_bins/nprocs bins (loads only those artifacts), joins the
jax.distributed runtime at localhost:<port>, maps the batch on the global
(data, bin) mesh, and process 0 writes the SAM. Launcher must set
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.

Failure-injection knobs (SURVEY.md §5.3 — restart at batch granularity):
  --shards DIR       process 0 commits one atomic output shard per batch
                     (io/shards.py manifest); restart resumes past them.
  --crash-after K    process <crash-pid> calls os._exit(17) after K batches
                     are committed — simulates a host dying mid-run.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pid", type=int)
    ap.add_argument("nprocs", type=int)
    ap.add_argument("port", type=int)
    ap.add_argument("db_dir")
    ap.add_argument("reads")
    ap.add_argument("out")
    ap.add_argument("reads2", nargs="?", default=None)
    ap.add_argument("--batch-size", type=int, default=1_000_000)
    ap.add_argument("--shards", default=None)
    ap.add_argument("--crash-after", type=int, default=None)
    ap.add_argument("--crash-pid", type=int, default=0)
    ap.add_argument("--sm", default="tag", choices=["tag", "record", "omit"])
    ap.add_argument("-s", "--strata", type=int, default=0)
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from dream_yara_tpu.parallel.multihost import (MultiHostDreamMapper,
                                                   init_multihost)
    init_multihost(f"localhost:{a.port}", a.nprocs, a.pid)
    assert jax.process_count() == a.nprocs

    from dream_yara_tpu.io.fastq import FastqBatchReader
    from dream_yara_tpu.utils.options import MapperOptions

    opts = MapperOptions(error_rate=0.03, library_length=300,
                         library_deviation=60, secondary_matches=a.sm,
                         strata_count=a.strata)
    mapper = MultiHostDreamMapper(a.db_dir, opts)
    print(f"[mh {a.pid}] mesh={dict(mapper.mesh.shape)} "
          f"my_bins={mapper.my_bins}", file=sys.stderr)

    reader = FastqBatchReader(a.reads, a.reads2, batch_size=a.batch_size)

    if a.shards:
        # per-batch atomic shards + manifest resume: EVERY process iterates
        # the same batches (the mesh step is collective), process 0 commits
        from dream_yara_tpu.io.shards import ShardedSamWriter, skip_reads
        from dream_yara_tpu.pipeline.writer import sam_header

        sw = ShardedSamWriter(a.shards) if a.pid == 0 else None
        if sw is not None:
            sw.write_header("\n".join(sam_header(
                mapper.contigs, "multihost_demo")) + "\n")
            done = sw.reads_done
        else:
            done = 0
        # reads_done is identical on every process (same manifest semantics:
        # broadcast process 0's value so non-writers skip the same batches)
        from jax.experimental import multihost_utils as mh
        import numpy as np
        done = int(np.asarray(mh.process_allgather(
            np.array([done], dtype=np.int64))).reshape(-1)[0])
        batches = skip_reads(reader, done)
        shard_i = sw.done_batches if sw is not None else done // a.batch_size
        committed = shard_i
        for batch in batches:
            sam = mapper.map_sam(batch, cmdline="multihost_demo",
                                 header=False)
            if sw is not None:
                sw.write_batch(shard_i, sam, batch.n_reads)
            shard_i += 1
            committed += 1
            # barrier so the crash lands AFTER the shard commit everywhere
            mh.sync_global_devices(f"shard_{shard_i}")
            if a.crash_after is not None and committed >= a.crash_after \
                    and a.pid == a.crash_pid:
                import os
                print(f"[mh {a.pid}] injected crash after "
                      f"{committed} batches", file=sys.stderr)
                os._exit(17)
        if sw is not None:
            sw.finalize(a.out)
            print(f"[mh 0] wrote {a.out}", file=sys.stderr)
        return

    out_parts = []
    header = True
    for batch in reader:
        sam = mapper.map_sam(batch, cmdline="multihost_demo", header=header)
        header = False
        if jax.process_index() == 0:
            out_parts.append(sam)
    if jax.process_index() == 0:
        Path(a.out).write_bytes(b"".join(out_parts))
        print(f"[mh 0] wrote {a.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
