"""Build the native C++ libraries with g++ (no external deps)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
LIBS = {
    "libdyalign.so": ["align.cpp"],
    "libdysais.so": ["sais.cpp"],
    "libdysamfmt.so": ["samfmt.cpp"],
    "libdyscatter.so": ["scatter.cpp"],
    "libdyseqio.so": ["seqio.cpp"],
    "libdyreadpack.so": ["readpack.cpp"],
}


def build(name: str, quiet: bool = True) -> Path | None:
    out = HERE / name
    srcs = [HERE / s for s in LIBS[name]]
    if not all(s.exists() for s in srcs):
        return None
    if out.exists() and all(out.stat().st_mtime > s.stat().st_mtime for s in srcs):
        return out
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fopenmp",
           "-shared", "-fPIC", *[str(s) for s in srcs], "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native] build of {name} failed: {e}", file=sys.stderr)
        return None
    return out


def main():
    for name in LIBS:
        p = build(name, quiet=False)
        print(f"[native] {name}: {'built -> ' + str(p) if p else 'SKIPPED'}")


if __name__ == "__main__":
    main()
