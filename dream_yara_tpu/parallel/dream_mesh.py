"""Mesh DREAM driver: the multi-device edition of pipeline/dis_mapper.py.

Host orchestration around parallel/dist_mapper.build_mesh_dream_step:
upload packed read shards, run classify->route->map on the (data, bin) mesh,
decode the fixed-shape match buffers, and re-map any (bin, reads) subset
whose fixed capacities overflowed through the exact single-chip BinMapper —
so the merged match set (and therefore the SAM bytes, after the canonical
rank/dedup) is identical to the single-device DREAM pipeline for any mesh
shape (SURVEY.md §4.4 determinism requirement; reference d_mapper.h merges
per-bin matches into one store the same way [U]).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..io.readstore import ReadBatch
from ..ops.device_index import DeviceFMSet
from ..pipeline.dis_mapper import DreamIndex, _finish_batch, _sub_batch
from ..pipeline.map_step import max_seed_len_static, use_pallas_default
from ..pipeline.matches import Matches
from ..pipeline.seeding import max_errors_for_batch, rate_to_ppm
from ..utils.options import MapperOptions
from ..utils.timer import StageTimers
from .dist_mapper import (MeshMapOut, build_mesh_dream_step, decode_routing,
                          pack_batch_blob, pack_route_words, shard_db)
from .mesh import make_mesh

META_ROW_MASK = (1 << 18) - 1


class MeshDreamMapper:
    """Maps batches against all bins on a (data, bin) device mesh."""

    def __init__(self, index: DreamIndex, opts: MapperOptions,
                 mesh=None, n_devices: int | None = None,
                 r_cap: int | None = None, use_pallas: bool | None = None):
        self.index = index
        self.opts = opts
        self.mesh = mesh or make_mesh(n_devices, n_bins=index.n_bins)
        self.bin_ax = self.mesh.shape["bin"]
        self.data_ax = self.mesh.shape["data"]
        self.B = ((index.n_bins + self.bin_ax - 1) // self.bin_ax) * self.bin_ax
        self.r_cap_arg = r_cap
        self.use_pallas = (use_pallas_default() if use_pallas is None
                           else use_pallas)

        fms = list(index.fms)
        texts = [st.text for st in index.stores]
        # pad to the bin axis with empty bins (n=0: searches return empty)
        host_set = DeviceFMSet.from_host(fms, texts, pad_bins_to=self.B)
        self.fmset = shard_db(self.mesh, host_set)
        self.prefix_q = host_set.prefix_q
        self.sample_rate = fms[0].sample_rate if fms else 1

        self.use_filter = (index.filter_type != "none"
                           and index.filter is not None)
        if self.use_filter:
            self.filter_words = jax.device_put(
                jnp.asarray(index.filter.words),
                jax.sharding.NamedSharding(self.mesh,
                                           jax.sharding.PartitionSpec()))
            self.k = index.filter.k
            self.n_hashes = index.filter.n_hashes
            self.window = getattr(index.filter, "window", 0)
        else:
            self.filter_words = jnp.zeros((1, 2), dtype=jnp.uint32)
            self.k = self.n_hashes = self.window = 0
        self._steps: dict = {}

    def _r_cap(self, half_loc: int) -> int:
        if self.r_cap_arg is not None:
            return min(self.r_cap_arg, half_loc)
        if not self.use_filter:
            return half_loc
        # expected per-bin routed reads ~ half_loc * routes/B; 4x headroom,
        # overflow drains through extra mesh passes (never dropped). When a
        # batch needed >= 2 drain passes (skewed databases, config 5), the
        # capacity auto-grows for later batches — one recompile, monotone.
        base = max(64, min(half_loc, (4 * half_loc + self.B - 1) // self.B))
        return max(base, min(getattr(self, "_tuned_r_cap", 0), half_loc))

    def _step(self, half_loc: int, L: int, r_cap: int, rate_ppm: int,
              max_err: int, max_slen: int, uniform_len: bool = False,
              route_override: bool = False):
        key = (half_loc, L, r_cap, rate_ppm, max_err, uniform_len,
               route_override)
        if key not in self._steps:
            self._steps[key] = build_mesh_dream_step(
                self.mesh, half_loc=half_loc, L=L, B=self.B, r_cap=r_cap,
                rate_ppm=rate_ppm, max_errors=max_err, capacity=8,
                max_slen=max_slen, prefix_q=self.prefix_q,
                sample_rate=self.sample_rate, use_pallas=self.use_pallas,
                k=self.k, n_hashes=self.n_hashes, window=self.window,
                use_filter=self.use_filter, uniform_len=uniform_len,
                route_override=route_override)
        return self._steps[key]

    def map_batch(self, batch: ReadBatch,
                  timers: StageTimers | None = None) -> Matches:
        """All matches in GLOBAL int64 coordinates (like dis_map_batch)."""
        return self.map_batch_async(batch, timers)()

    def map_batch_async(self, batch: ReadBatch,
                        timers: StageTimers | None = None):
        """Dispatch the mesh step NOW (async), return a drain() closure that
        fetches + collects. Dispatch-ahead callers hide batch i+1's shard
        uploads under batch i's mesh compute (see dis_map_batch_async)."""
        timers = timers or StageTimers()
        n = batch.n_reads
        L = batch.max_len
        rate_ppm = rate_to_ppm(self.opts.error_rate)
        max_err = max(1, max_errors_for_batch(L, self.opts.error_rate))
        max_slen = max_seed_len_static(L, rate_ppm)

        blob, half_loc = pack_batch_blob(batch.seqs[:n], batch.lengths,
                                         self.data_ax, L)
        r_cap = self._r_cap(half_loc)
        uniform_len = (bool(np.all(batch.lengths == L))
                       and (L * rate_ppm) // 10_000 == max_err)
        step_key = (half_loc, L, r_cap, rate_ppm, max_err, max_slen,
                    uniform_len)
        step = self._step(*step_key)
        with timers.stage("mesh map (device)"):
            out_dev: MeshMapOut = step(self.fmset, self.filter_words,
                                       jnp.asarray(blob))
        return lambda: self._collect(batch, out_dev, n, half_loc, r_cap,
                                     timers, blob=blob, step_key=step_key)

    MAX_DRAIN = 6  # extra mesh passes for route-capacity overflow before
                   # falling back to the single-chip path (config-5 skew)

    def _collect(self, batch: ReadBatch, out_dev: MeshMapOut, n: int,
                 half_loc: int, r_cap: int, timers: StageTimers,
                 blob: np.ndarray | None = None,
                 step_key: tuple | None = None) -> Matches:
        index = self.index
        parts: list[Matches] = []
        # diagnostics: why reads fell back (route-cap vs seed-capacity vs
        # verify-lane spill), accumulated across batches for the bench report
        diag = self.fallback_diag = getattr(
            self, "fallback_diag",
            {"spill_bins": 0, "route_ovf": 0, "seed_ovf": 0, "routed": 0,
             "drain_passes": 0})
        diag.setdefault("drain_passes", 0)

        n_pad = self.data_ax * half_loc
        drains = 0
        while True:
            with timers.stage("mesh fetch (device wait)"):
                out = MeshMapOut(*(np.asarray(x) for x in out_dev))
            routing = decode_routing(out.route_words, n, self.B)
            diag["routed"] += int(routing.sum())
            leftover = self._process_out(batch, out, routing, n, half_loc,
                                         r_cap, n_pad, parts, timers, diag)
            if not leftover.any():
                break
            if blob is None or step_key is None or drains >= self.MAX_DRAIN:
                # exhausted drain budget: exact single-chip re-map of the rest
                for b in np.flatnonzero(leftover[:n].any(axis=0)):
                    ids = np.flatnonzero(leftover[:n, b])
                    with timers.stage("mesh overflow fallback (host)"):
                        self._fallback(batch, b, ids,
                                       int(index.contigs.bin_starts[b]),
                                       parts, timers)
                break
            # capacity drain: re-submit ONLY the leftover (read, bin) pairs
            # through the same compiled mesh step with a routing override —
            # hot-bin overflow costs extra device passes, not host re-maps
            drains += 1
            diag["drain_passes"] += 1
            words = pack_route_words(leftover, self.B)
            step_ov = self._step(*step_key, route_override=True)
            with timers.stage("mesh map (device)"):
                out_dev = step_ov(self.fmset, self.filter_words,
                                  jnp.asarray(blob), jnp.asarray(words))
        if drains >= 2 and self.r_cap_arg is None:
            # persistent skew: grow the default capacity for later batches
            # (one recompile; growth is monotone and capped at half_loc)
            self._tuned_r_cap = min(half_loc,
                                    max(getattr(self, "_tuned_r_cap", 0),
                                        2 * r_cap))
        return Matches.concat(parts)

    def _process_out(self, batch, out: MeshMapOut, routing, n, half_loc,
                     r_cap, n_pad, parts, timers, diag):
        """Decode one mesh pass; returns the (n_pad, B) leftover routing of
        reads that arrived after r_cap slots filled (route overflow)."""
        opts = self.opts
        index = self.index
        D, cap2v = self.data_ax, 2 * r_cap
        sens = opts.sensitivity
        leftover = np.zeros((n_pad, self.B), dtype=bool)
        for b in range(index.n_bins):
            off = int(index.contigs.bin_starts[b])
            ids_b = np.flatnonzero(routing[:, b])
            if len(ids_b) == 0:
                continue
            if int(out.n_spilled[b].sum()) > 0:
                diag["spill_bins"] += 1
                # verify-lane compaction spilled (rare at cap2v = 2 lanes per
                # routed read): re-map the bin's routed subset through the
                # exact single-chip path (byte-equality, never silent drops)
                with timers.stage("mesh spill fallback (host)"):
                    self._fallback(batch, b, ids_b, off, parts, timers)
                continue
            # surgical per-READ fallback: only reads whose seed hits
            # overflowed `capacity` (they need the repetitive/full pass)
            # re-map through the single-chip BinMapper; route-overflow reads
            # go to `leftover` for the next drain pass; everything else keeps
            # its mesh matches — the extra passes only ever add matches for
            # overflowing rows, so per-read granularity preserves
            # byte-equality with the single-device DREAM pipeline.
            fb_mask = np.zeros(n, dtype=bool)
            with timers.stage("mesh collect (host)"):
                for d in range(D):
                    lo_ids = ids_b[(ids_b >= d * half_loc)
                                   & (ids_b < (d + 1) * half_loc)]
                    if len(lo_ids) > r_cap:            # route overflow
                        leftover[lo_ids[r_cap:], b] = True
                        diag["route_ovf"] += len(lo_ids) - r_cap
                    kslot = min(len(lo_ids), r_cap)
                    if sens != "low":
                        ovf = out.ovf_rows[b, d * cap2v : (d + 1) * cap2v]
                        slot_ovf = ovf[:r_cap] | ovf[r_cap:]   # fwd | rc row
                        fb_mask[lo_ids[:kslot][slot_ovf[:kslot]]] = True
                        diag["seed_ovf"] += int(slot_ovf[:kslot].sum())
                    meta = out.meta[b, d * cap2v : (d + 1) * cap2v]
                    ok = (meta.view(np.uint32) >> 31) > 0
                    if not ok.any():
                        continue
                    meta = meta[ok]
                    subrow = (meta & META_ROW_MASK).astype(np.int64)
                    dist = ((meta >> 18) & 31).astype(np.int32)
                    begin = out.begin[b, d * cap2v : (d + 1) * cap2v][ok]
                    end = out.end[b, d * cap2v : (d + 1) * cap2v][ok]
                    slot = subrow % r_cap
                    strand = (subrow // r_cap).astype(np.int8)
                    read_id = lo_ids[slot]
                    keep = ~fb_mask[read_id]           # fallback reads: the
                    parts.append(Matches(               # re-map is exhaustive
                        read_id=read_id[keep].astype(np.int32),
                        strand=strand[keep],
                        begin=begin[keep].astype(np.int64) + off,
                        end=end[keep].astype(np.int64) + off,
                        dist=dist[keep]))
            fb_ids = np.flatnonzero(fb_mask)
            if len(fb_ids):
                with timers.stage("mesh overflow fallback (host)"):
                    self._fallback(batch, b, fb_ids, off, parts, timers)
        return leftover

    def _fallback(self, batch: ReadBatch, b: int, ids: np.ndarray, off: int,
                  parts: list[Matches], timers: StageTimers) -> None:
        """Re-map a read subset of bin b through the exact single-chip path.

        The BinMapper reuses this mapper's resident DeviceFMSet (an on-device
        slice, moved to device 0 once per bin over ICI) instead of re-uploading
        the bin index over the slow host->device tunnel; since every view
        shares the set's padded shape, ONE XLA compile serves all bins."""
        dev_view = lambda: jax.tree.map(
            lambda x: jax.device_put(x, jax.devices()[0]), self.fmset.bin(b))
        bm = self.index.bin_mapper(b, self.opts, timers, dev_factory=dev_view,
                                   prefix_q=self.prefix_q,
                                   sample_rate=self.sample_rate)
        m = bm.map_batch(_sub_batch(batch, ids))
        m.begin += off
        m.end += off
        m.read_id = ids[m.read_id].astype(np.int32)
        parts.append(m)


def mesh_dream_sam(mapper: MeshDreamMapper, batch: ReadBatch,
                   cmdline: str = "", timers: StageTimers | None = None,
                   header: bool = True, stats: dict | None = None) -> str:
    """Full mesh DREAM pipeline -> SAM text (same finishing stages as the
    single-device dream_map_sam: rank/dedup, PE rescue, CIGAR, writer)."""
    timers = timers or StageTimers()
    m = mapper.map_batch(batch, timers)
    return _finish_batch(mapper.index, batch, m, mapper.opts, cmdline, timers,
                         header, stats)


def mesh_dream_stream(mapper: MeshDreamMapper, batches,
                      cmdline: str = "", timers: StageTimers | None = None,
                      stats: dict | None = None):
    """Yield SAM text per batch, overlapping the mesh device step of batch
    i+1 with host finishing (rank/dedup, rescue, CIGAR, SAM) of batch i —
    the mesh edition of pipeline/dis_mapper.dream_map_stream (SURVEY.md
    §2.10 pipeline-parallelism row). A worker thread drives uploads +
    mesh dispatch + collect; the main thread consumes finished match sets.
    Queue(maxsize=1) bounds device-side lookahead to one in-flight batch."""
    import threading
    from queue import Queue

    timers = timers or StageTimers()
    q: Queue = Queue(maxsize=1)
    sentinel = object()
    err: list[BaseException] = []

    def device_worker():
        # dispatch-ahead: queue batch i+1's uploads + mesh compute before
        # draining batch i (see dis_mapper.dream_map_stream)
        prev = None
        try:
            for batch in batches:
                cur = (batch, mapper.map_batch_async(batch, timers))
                if prev is not None:
                    p, prev = prev, None
                    q.put((p[0], p[1]()))
                prev = cur
        except BaseException as e:
            err.append(e)
        finally:
            if prev is not None:
                try:
                    q.put((prev[0], prev[1]()))
                except BaseException as e:
                    if not err:
                        err.append(e)
            q.put(sentinel)

    t = threading.Thread(target=device_worker, daemon=True)
    t.start()
    first = True
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        batch, m = item
        yield _finish_batch(mapper.index, batch, m, mapper.opts, cmdline,
                            timers, header=first, stats=stats)
        first = False
