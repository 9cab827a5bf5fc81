"""A/B the blocked-IBF probe-word select at config-3-like scale.

The blocked classify fetches one 512 B block row per window and then picks
each probe's words. Variants:
  onehot    — current production path (iota==pj one-hot select + sum)
  takealong — take_along_axis on the (Q, S, wdc) view of the fetched rows
  element   — 3 per-probe single-word gathers straight from the big table
              (the pre-round-2 layout; known slow)

Synthetic 64-bin blocked filter sized by arg2 (MiB, default 256 — beyond
any cache, like the 3 GiB config-3 filter). Q windows default 2M (about
one tenth of a 250k-read c3 batch; scale linearly).

python tools/proto_classify_select.py [Q=2000000] [filter_mib=256]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    mib = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    S, wdc = 64, 2                       # 64 bins: 2 words, 64 probes/block
    n_blocks = (mib << 20) // (S * wdc * 4)
    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, 1 << 32, (n_blocks, S * wdc),
                           dtype=np.uint32)
    rows = jnp.asarray(rows_np)
    block = jnp.asarray(rng.integers(0, n_blocks, Q, dtype=np.int32))
    base = jnp.asarray(rng.integers(0, S, Q, dtype=np.uint32).astype(np.uint32))
    stride = jnp.asarray((rng.integers(0, S, Q, dtype=np.int64) | 1)
                         .astype(np.uint32))
    nh = 3

    def onehot(rows, flat, block, base, stride):
        br = jnp.take(rows, block, axis=0)               # (Q, S*wdc)
        iota = jnp.arange(S * wdc, dtype=jnp.uint32)[None, :]
        anded = None
        for j in range(nh):
            pj = (base + jnp.uint32(j) * stride) & jnp.uint32(S - 1)
            sel = (iota // jnp.uint32(wdc)) == pj[:, None]
            gw = jnp.where(sel, br, jnp.uint32(0))
            gw = gw.reshape(-1, S, wdc).sum(axis=1, dtype=jnp.uint32)
            anded = gw if anded is None else (anded & gw)
        return anded.astype(jnp.uint32).sum()

    def takealong(rows, flat, block, base, stride):
        br = jnp.take(rows, block, axis=0).reshape(-1, S, wdc)
        anded = None
        for j in range(nh):
            pj = ((base + jnp.uint32(j) * stride) & jnp.uint32(S - 1)) \
                .astype(jnp.int32)
            gw = jnp.take_along_axis(br, pj[:, None, None], axis=1)[:, 0]
            anded = gw if anded is None else (anded & gw)
        return anded.astype(jnp.uint32).sum()

    flat = jnp.asarray(rows_np.reshape(-1))

    def element(rows, flat, block, base, stride):
        anded = None
        for j in range(nh):
            pj = (base + jnp.uint32(j) * stride) & jnp.uint32(S - 1)
            idx = block * (S * wdc) + (pj.astype(jnp.int32)) * wdc
            ws = [jnp.take(flat, idx + w) for w in range(wdc)]
            gw = jnp.stack(ws, axis=1)
            anded = gw if anded is None else (anded & gw)
        return anded.astype(jnp.uint32).sum()

    for name, fn in (("onehot", onehot), ("takealong", takealong),
                     ("element", element)):
        f = jax.jit(fn)
        print("  warm:", int(np.asarray(f(rows, flat, block, base, stride))),
              file=sys.stderr)
        ts = []
        for rep in range(5):
            # vary an input so no execution can be elided, and fetch the
            # scalar to host so the timing spans the real round trip
            b2 = (block + rep) % np.int32(1)  # noop math, same values
            b2 = block
            t0 = time.time()
            v = int(np.asarray(f(rows, flat, b2, base + np.uint32(rep),
                                 stride)))
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        print(f"[sel] {name:10s}: {med*1e3:8.1f} ms for {Q/1e6:.1f}M windows "
              f"({Q/med/1e6:.0f}M windows/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
