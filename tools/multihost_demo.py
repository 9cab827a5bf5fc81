"""One process of a multi-host DREAM mapping run (CPU validation harness).

Usage (launched once per process, usually by tests/test_multihost.py):
  python tools/multihost_demo.py <pid> <nprocs> <port> <db_dir> <reads.fq> \
      <out.sam> [reads2.fq]

Each process owns n_bins/nprocs bins (loads only those artifacts), joins the
jax.distributed runtime at localhost:<port>, maps the batch on the global
(data, bin) mesh, and process 0 writes the SAM. Launcher must set
XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    db_dir, reads_path, out_path = sys.argv[4], sys.argv[5], sys.argv[6]
    reads2 = sys.argv[7] if len(sys.argv) > 7 else None

    import jax
    jax.config.update("jax_platforms", "cpu")
    from dream_yara_tpu.parallel.multihost import (MultiHostDreamMapper,
                                                   init_multihost)
    init_multihost(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs

    from dream_yara_tpu.io.fastq import FastqBatchReader
    from dream_yara_tpu.utils.options import MapperOptions

    opts = MapperOptions(error_rate=0.03, library_length=300,
                         library_deviation=60)
    mapper = MultiHostDreamMapper(db_dir, opts)
    print(f"[mh {pid}] mesh={dict(mapper.mesh.shape)} my_bins={mapper.my_bins}",
          file=sys.stderr)

    reader = FastqBatchReader(reads_path, reads2, batch_size=1_000_000)
    out_parts = []
    header = True
    for batch in reader:
        sam = mapper.map_sam(batch, cmdline="multihost_demo", header=header)
        header = False
        if jax.process_index() == 0:
            out_parts.append(sam)
    if jax.process_index() == 0:
        Path(out_path).write_text("".join(out_parts))
        print(f"[mh 0] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
