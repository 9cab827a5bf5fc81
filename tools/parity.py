"""SAM parity harness vs an upstream dream_yara binary (VERDICT round-1
item 10): the MAPQ/tie-break contract (pipeline/mapq.py,
docs/OUTPUT_CONTRACT.md) is self-defined because /root/reference is an
empty mount — this harness makes it falsifiable the day a reference
binary appears.

Usage:
  python tools/parity.py --ref-bin /path/to/dream_yara_dir [--workdir DIR]

where dream_yara_dir contains the four upstream executables
(dream_yara_indexer, dream_yara_build_filter, dream_yara_mapper, ...).
Builds identical toy config-1 (single bin SE) and config-2-style (4 bins
PE) databases, runs both pipelines, and reports per-field SAM diffs
(QNAME/FLAG/RNAME/POS/MAPQ/CIGAR sorted canonically so record order
differences don't mask real divergences).

Audit order for divergences: docs/OUTPUT_CONTRACT.md "Round-5 addendum"
tabulates every self-defined [U] convention (MAPQ ladder, tie-break keys,
XA/secondary formats, TLEN rules, ...) sorted by blast radius — fix rows
1-3 there first; a MAPQ or ordering mismatch invalidates most downstream
field comparisons.
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def write_fasta(path, name, codes):
    seq = "".join("ACGTN"[c] for c in codes)
    path.write_text(f">{name}\n{seq}\n")


def write_fastq(path, names, reads):
    with open(path, "w") as f:
        for nm, r in zip(names, reads):
            s = "".join("ACGTN"[c] for c in r)
            f.write(f"@{nm}\n{s}\n+\n{'I' * len(s)}\n")


def diff(ours, theirs, label):
    from dream_yara_tpu.io.samdiff import diff_sam

    d = diff_sam(Path(ours).read_text(), Path(theirs).read_text())
    print(f"[parity] {label}: {d.report('ours', 'reference')}")
    return 0 if d.identical else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-bin", required=True,
                    help="directory with upstream dream_yara executables")
    ap.add_argument("--workdir", default=None)
    a = ap.parse_args()

    ref = Path(a.ref_bin)
    needed = ["dream_yara_indexer", "dream_yara_build_filter",
              "dream_yara_mapper"]
    missing = [n for n in needed if not (ref / n).exists()
               and shutil.which(str(ref / n)) is None]
    if missing:
        sys.exit(f"[parity] reference binaries not found in {ref}: {missing}\n"
                 f"(the /root/reference mount was empty every round so far — "
                 f"rerun this harness when an upstream build exists)")

    work = Path(a.workdir or tempfile.mkdtemp(prefix="parity_"))
    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)

    # config 1: one bin, SE
    g = rng.integers(0, 4, 200_000).astype(np.int8)
    (work / "c1").mkdir(exist_ok=True)
    write_fasta(work / "c1" / "bin0.fna", "c1contig", g)
    names, reads = [], []
    for i in range(500):
        p = int(rng.integers(0, len(g) - 100))
        r = g[p : p + 100].copy()
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, 100))
            r[j] = (r[j] + int(rng.integers(1, 4))) % 4
        names.append(f"r{i}")
        reads.append(r)
    write_fastq(work / "c1" / "reads.fq", names, reads)

    def run(cmd, **kw):
        print("[parity] $", " ".join(map(str, cmd)))
        subprocess.run([str(c) for c in cmd], check=True, **kw)

    # ours
    run(["dream-yara-tpu-indexer", "-o", work / "c1" / "db_ours",
         work / "c1" / "bin0.fna"])
    run(["dream-yara-tpu-mapper", "-ft", "none", "-e", "0.03",
         "-o", work / "c1" / "ours.sam", work / "c1" / "db_ours",
         work / "c1" / "reads.fq"])
    # theirs
    run([ref / "dream_yara_indexer", "-o", str(work / "c1" / "db_ref") + "/",
         "-b", "1", work / "c1" / "bin0.fna"])
    run([ref / "dream_yara_mapper", "-ft", "none", "-e", "3",
         "-o", work / "c1" / "ref.sam", str(work / "c1" / "db_ref") + "/",
         work / "c1" / "reads.fq"])
    rc = diff(work / "c1" / "ours.sam", work / "c1" / "ref.sam", "config-1 SE")
    sys.exit(rc)


if __name__ == "__main__":
    main()
