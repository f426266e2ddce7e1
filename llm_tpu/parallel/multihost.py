"""Multi-host (DCN) initialization and mesh construction.

The reference is strictly single-process (SURVEY.md §2.5); this module is
the TPU-native scale-out layer for multi-host slices:

- `initialize()` wraps jax.distributed.initialize — the JAX coordination
  service over DCN (one process per host; on Cloud TPU the coordinator and
  process ids are auto-detected from the environment).
- `multihost_mesh()` builds a global ("data", "model") mesh in which the
  tensor-parallel `model` axis stays WITHIN a host's ICI domain and the
  `data` axis (stream batches of the continuous-batching engine) spans
  hosts over DCN — collectives for TP ride ICI, only data-parallel traffic
  (none at inference steady state) crosses DCN.

Weights/caches placed with llm_tpu.parallel.shard_params/shard_cache work
unchanged on a multihost mesh: NamedSharding is global, and each process
addresses only its local shard. This cannot be exercised on the single-chip
CI environment; the driver's dryrun_multichip covers the SPMD partitioning
on a virtual device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_tpu.parallel.sharding import MeshConfig, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed coordination service (call before any other
    JAX API in each host process)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def multihost_mesh(model_parallel: Optional[int] = None):
    """Global mesh: `model` within each host (ICI), `data` across hosts.

    model_parallel defaults to the local device count, which keeps every
    TP collective on ICI.
    """
    local = jax.local_device_count()
    total = jax.device_count()
    model_parallel = model_parallel or local
    assert total % model_parallel == 0, (total, model_parallel)
    return make_mesh(
        MeshConfig(data=total // model_parallel, model=model_parallel)
    )


# ---------------------------------------------------------------------------
# cross-host continuous batching
#
# Nothing in the reference to mirror (it is single-process by design —
# SURVEY.md §2.5; the vestigial multi-GPU hook is
# /root/reference/crates/ggml/src/accelerator/mod.rs:68-77). Design:
#
# - One global ("data", "model") mesh. Weights are TP-sharded over `model`
#   (ICI-local within each host) and replicated over `data`; the batched KV
#   cache's stream axis rides `data`, so each host OWNS the slots whose
#   cache shard is local and serves its own request queue into them.
# - Every process must dispatch the SAME jitted computation each step (SPMD
#   multi-controller rule), so per-step decisions are agreed via a tiny
#   process_allgather of host intents (prefill pending? decodable? global
#   max n_past for the window bucket), then all hosts dispatch:
#     1. a global chunked-prefill step (ids [B, n_batch]) whenever ANY host
#        has a prefilling stream — every prefilling stream on every host
#        advances one chunk in the same dispatch; hosts without one
#        contribute masked dummy rows at their streams' frontiers, and
#     2. a global decode step (ids [B, 1]) over decode-ready streams.
# - Sampling stays host-side per stream on the host's OWN logits shard
#   (logits come back sharded over `data`; no cross-host logit traffic).
# - At decode steady state no collective crosses DCN: TP all-reduces stay
#   on ICI, the batch axis needs no communication, and the only DCN
#   traffic is the few-byte intent allgather.


from llm_tpu.serve import Engine as _LocalEngine


class MultiHostEngine(_LocalEngine):
    """Continuous batching scheduled across hosts (one instance per host
    process over a shared global mesh). Single-process meshes work too —
    the coordination collapses to local no-ops.

    Inherits the single-host engine's host-side plumbing (submit, _Stream
    bookkeeping, chunked-prefill state machine, token postprocess); all
    device dispatch is replaced by globally-coordinated SPMD steps. Does
    NOT call the base constructor (device state is global here).
    """

    # block-path flat bias would need a cross-host agreement on the
    # biased-token union (static structure); those requests use the
    # per-token host-sampling path instead
    supports_device_bias = False

    def __init__(
        self,
        model,
        mesh,
        global_streams: int = 8,
        kv_dtype=jnp.bfloat16,
        n_batch: int = 64,
    ):
        from llm_tpu.models.forward import forward_batched, init_cache_batched
        from llm_tpu.parallel.sharding import shard_params
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.model = model
        self.spec = model.spec
        self.mesh = mesh
        self.n_batch = n_batch
        self.global_streams = global_streams
        data = mesh.shape["data"]
        assert global_streams % data == 0, (global_streams, data)
        # prefill chunks are dispatched at FIXED width n_batch (SPMD: all
        # hosts run the identical program); requiring n_batch | n_ctx keeps
        # every padded chunk write inside the cache ring
        assert model.spec.n_ctx % n_batch == 0, (model.spec.n_ctx, n_batch)

        self.params = shard_params(model.params, mesh)

        def ns(*spec):
            return NamedSharding(mesh, P(*spec))

        def dim_ok(size, axis):
            return size % mesh.shape[axis] == 0

        spec = self.spec
        quant = kv_dtype in (jnp.int8, "int8")
        h_ax = "model" if dim_ok(spec.n_head_kv, "model") else None
        # head-major batched cache [L, B, H_kv, S, D]
        kv_sh = ns(None, "data", h_ax, None, None)
        sc_sh = ns(None, "data", h_ax, None)
        from llm_tpu.models.forward import KVCache

        cache_sh = KVCache(
            kv_sh, kv_sh, sc_sh if quant else None, sc_sh if quant else None
        )
        self.cache = jax.jit(
            lambda: init_cache_batched(spec, global_streams, kv_dtype),
            out_shardings=cache_sh,
        )()

        # each host owns the contiguous run of stream rows whose cache
        # shard is addressable locally
        imap = self.cache.k.sharding.devices_indices_map(self.cache.k.shape)
        rows = [
            (sl[1].start or 0, sl[1].stop or global_streams)
            for d, sl in imap.items()
            if d.process_index == jax.process_index()
        ]
        self._row0 = min(r[0] for r in rows)
        row1 = max(r[1] for r in rows)
        self.max_streams = row1 - self._row0  # local slots

        self._out_sh = (ns("data", None, None), ns("data", None, None), cache_sh)
        self._h_ax = h_ax
        _mesh = mesh

        def _step(spec, params, ids, n_past, cache, window, write_mask):
            # mesh/h_ax route the cache write through shard_map (local
            # per-row DUS, zero data-axis collectives — see
            # write_cache_batched)
            return forward_batched(spec, params, ids, n_past, cache,
                                   window, write_mask, _mesh, h_ax)

        self._step_jit = jax.jit(
            _step,
            static_argnums=(0, 5),
            donate_argnums=(4,),
            out_shardings=self._out_sh,
        )  # (spec, params, ids, n_past, cache, window, write_mask)

        # host-local stream state
        self.slots = [None] * self.max_streams
        self.pending = []
        self.finished = {}
        self._retired_events = []
        self._next_id = jax.process_index() * 1_000_000  # host-unique ids
        self._eot = model.eot_token_id()
        self._steps = 0

    def step_multi(self, n_steps: int = 16) -> list:
        """Globally-coordinated on-device multi-token decode: all hosts
        dispatch one decode_loop_batched block over the global batch with
        a PRNG key derived from the synchronized step counter. The static
        sampler structure must be globally agreed, so the hosts allgather
        (any_sample, top_k_max) and build one BatchedDeviceSampler; flat
        token biases are not supported across hosts yet (assert)."""
        from jax.experimental import multihost_utils

        from llm_tpu.models.forward import (
            _decode_loop_batched_jit,
            window_bucket,
        )
        from llm_tpu.ops.sampling import BatchedDeviceSampler, batched_sampler

        self._admit()
        events = self._drain_retired()
        self._steps += 1
        n_pref, _, gmax, _ = self._sync()
        if n_pref:
            self._global_prefill_chunk(gmax)
            events += self._drain_retired()

        active = self._decodable()
        per_slot = [None] * self.max_streams
        for i, s in active:
            ds = s.request.device_sampler
            assert ds is not None, "step_multi requires device_sampler"
            assert not ds.bias, "multi-host step_multi: bias unsupported"
            per_slot[i] = ds

        # agree on (any decodable, static sampler structure, global max)
        local = np.array(
            [
                len(active),
                int(any(d is not None and d.kind == "sample" for d in per_slot)),
                max((d.top_k for d in per_slot
                     if d is not None and d.kind == "sample"), default=0),
                max((s.prefill_pos if s.prefilling else s.n_past
                     for s in self.slots if s is not None), default=0),
                *_sampler_structure_ints(per_slot),
                _logprobs_local(active),
            ],
            np.int64,
        )
        if jax.process_count() == 1:
            g = local[None]
        else:
            g = np.asarray(multihost_utils.process_allgather(local))
        n_dec = int(g[:, 0].sum())
        if n_dec == 0:
            return events
        try:
            cfg = BatchedDeviceSampler(
                sample=bool(g[:, 1].max()), top_k_max=int(g[:, 2].max()),
                bias_tokens=(), **_sampler_structure_cfg(g, 4),
            )
        except ValueError:
            # mixed mirostat kinds across the global batch: every host
            # computed the same allgathered bits, so every host takes this
            # same coordinated per-token fallback
            return events + self.step()
        from llm_tpu.ops.sampling import ensure_value_keys

        # built only AFTER the coordinated mixed-mirostat decision: a
        # host whose OWN streams mix kinds must reach the allgather (a
        # local raise here would desync it from its peers and deadlock
        # the collective — advisor r4)
        _, values = batched_sampler(per_slot, self.max_streams)
        values = ensure_value_keys(values, cfg, self.max_streams)
        lpn = int(g[:, 13].max())
        lpn = None if lpn < 0 else lpn
        gmax2 = int(g[:, 3].max())
        n_steps = min(n_steps, self.spec.n_ctx - 1 - gmax2)
        if n_steps <= 0:
            return events + self.step()

        logits = np.zeros((self.max_streams, self.spec.n_vocab), np.float32)
        n_past = np.zeros(self.max_streams, np.int32)
        mask = np.zeros(self.max_streams, bool)
        for i, s in active:
            logits[i] = s.last_logits
            n_past[i] = s.n_past
            mask[i] = True

        key = jax.random.PRNGKey(self._steps)  # same on every host
        ret_state = cfg.mirostat_kind != 0
        g_np, g_mask = self._replicated_rows(n_past, mask)
        out = list(_decode_loop_batched_jit(
            self.spec,
            self.params,
            self._to_global(logits, ("data",)),
            g_np,
            self.cache,
            n_steps,
            window_bucket(gmax2 + n_steps, self.spec.n_ctx),
            cfg,
            key,
            self._to_global(
                {k: np.asarray(v) for k, v in values.items()}, ("data",)
            ),
            g_mask,
            self._sampler_state_global(cfg, active, gmax2),
            lpn,
            ret_state,
            self.mesh,
            self._h_ax,
        ))
        from llm_tpu.models.forward import unpack_decode_out

        toks, last_logits, _, self.cache, fstate, lp = unpack_decode_out(
            out, ret_state, lpn
        )
        lp_l = (tuple(self._local_rows(a, axis=1) for a in lp)
                if lp is not None else None)
        toks_l = self._local_rows(toks, axis=1)  # [n_steps, B_local]
        ll_l = self._local_rows(last_logits)
        if fstate is not None:
            from llm_tpu.ops.sampling import store_mu

            store_mu(active, self._local_rows(fstate["mu_steps"], axis=1),
                     self._block_keeps(active, toks_l))
        return events + self._postprocess_multi(
            active, toks_l, ll_l, n_steps, lp_l
        )

    # coordination --------------------------------------------------------

    def _sync(self) -> tuple[int, int, int, int]:
        """Agree on (prefilling, decodable, max position, work) across
        hosts. The only DCN traffic at decode steady state."""
        from jax.experimental import multihost_utils

        frontier = [
            s.prefill_pos if s.prefilling else s.n_past
            for s in self.slots
            if s is not None
        ]
        local = np.array(
            [
                sum(1 for s in self.slots if s is not None and s.prefilling),
                len(self._decodable()),
                max(frontier, default=0),
                1 if self.has_work() else 0,
            ],
            np.int64,
        )
        if jax.process_count() == 1:
            g = local[None]
        else:
            g = np.asarray(multihost_utils.process_allgather(local))
        return (
            int(g[:, 0].sum()),
            int(g[:, 1].sum()),
            int(g[:, 2].max()),
            int(g[:, 3].sum()),
        )

    def _replicated_rows(self, *arrs: np.ndarray):
        """Globally-REPLICATED placement of per-stream scalar rows (n_past,
        write masks). These feed scalar-indexed cache writes
        (write_cache_batched reads n_past[b] for a static b): if they were
        data-sharded, extracting the scalar forces XLA SPMD to communicate
        across `data` — on a real pod, a DCN all-gather of the whole cache
        per step (caught by tests/test_multihost.py zero-DCN audit).
        Replicating costs a few bytes per host over the same allgather
        budget as _sync."""
        if jax.process_count() == 1:
            gs = list(arrs)
        else:
            from jax.experimental import multihost_utils

            payload = np.concatenate(
                [np.array([self._row0], np.int64)]
                + [a.astype(np.int64) for a in arrs]
            )
            g = np.asarray(multihost_utils.process_allgather(payload))
            B = self.max_streams
            gs = [
                np.zeros(self.global_streams, a.dtype) for a in arrs
            ]
            for row in np.atleast_2d(g):
                r0 = int(row[0])
                for j, a in enumerate(arrs):
                    gs[j][r0 : r0 + B] = row[1 + j * B : 1 + (j + 1) * B
                                             ].astype(a.dtype)
        return tuple(self._to_global(a, ()) for a in gs)

    def _to_global(self, arr: np.ndarray, pspec_axes):
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        if jax.process_count() == 1:
            from jax.sharding import NamedSharding

            return jax.device_put(
                arr, NamedSharding(self.mesh, P(*pspec_axes))
            )
        return multihost_utils.host_local_array_to_global_array(
            arr, self.mesh, P(*pspec_axes)
        )

    def _sampler_state_global(self, cfg, active, global_max: int = 0):
        """Data-sharded sampler state when the agreed structure needs one:
        windowed-penalty counts (each host builds its local rows from its
        own streams' histories; the agreed window width keeps the jitted
        program identical across hosts — for the UNBOUNDED window the
        allgathered `global_max` position sizes the ring, since a
        local-longest sizing would give hosts different state shapes and
        desync the collective) and/or the mirostat mu carry (persisted on
        the streams between blocks). None when stateless."""
        st = {}
        if cfg.any_penalty:
            from llm_tpu.ops.sampling import penalty_state

            hist = [[] for _ in range(self.max_streams)]
            for i, s in active:
                hist[i] = s.tokens
            st.update(penalty_state(hist, cfg.penalty_last_n,
                                    self.spec.n_vocab,
                                    unbounded_floor=global_max))
        if cfg.mirostat_kind:
            from llm_tpu.ops.sampling import collect_mu

            st["mu"] = collect_mu(active, self.max_streams)
        if not st:
            return None
        return self._to_global(
            {k: np.asarray(v) for k, v in st.items()}, ("data",)
        )

    def _local_rows(self, arr, axis: int = 0) -> np.ndarray:
        """Assemble this host's stream rows (batch on `axis`) from the
        addressable shards of a global array."""
        out = None
        for sh in arr.addressable_shards:
            data = np.asarray(sh.data)
            if out is None:
                shape = list(arr.shape)
                shape[axis] = self.max_streams
                out = np.zeros(tuple(shape), data.dtype)
            start = (sh.index[axis].start or 0) - self._row0
            if 0 <= start < self.max_streams:
                # other axes may be sharded too (e.g. vocab over `model`):
                # place the shard at its own global index
                idx = list(sh.index)
                idx[axis] = slice(start, start + data.shape[axis])
                out[tuple(idx)] = data
        return out

    # stepping ------------------------------------------------------------

    def _dispatch_async(self, ids: np.ndarray, n_past: np.ndarray,
                        window: int, write_mask: np.ndarray):
        """Dispatch one step, returning the GLOBAL logits array without
        forcing it — jax dispatch is async, so callers may fire the
        already-sampled token events while the device computes (the same
        TTFT overlap as serve.Engine.step).

        n_past/write_mask ride replicated, NOT data-sharded: they index
        the cache writes per-stream, and scalar extraction from a sharded
        array would put the whole cache on DCN (see _replicated_rows)."""
        g_np, g_mask = self._replicated_rows(n_past, write_mask)
        logits, _, self.cache = self._step_jit(
            self.spec,
            self.params,
            self._to_global(ids, ("data",)),
            g_np,
            self.cache,
            window,
            g_mask,
        )
        return logits

    def _dispatch(self, ids: np.ndarray, n_past: np.ndarray, window: int,
                  write_mask: np.ndarray):
        return self._local_rows(
            self._dispatch_async(ids, n_past, window, write_mask)
        )

    def _global_prefill_chunk(self, gmax: int) -> None:
        from llm_tpu.models.forward import window_bucket

        spec = self.spec
        ids = np.zeros((self.max_streams, self.n_batch), np.int32)
        n_past = np.zeros(self.max_streams, np.int32)
        mask = np.zeros(self.max_streams, bool)  # only prefilling rows write
        chunk_lens = {}
        for i, s in enumerate(self.slots):
            if s is None or not s.prefilling:
                continue
            chunk = s.prefill_queue[
                s.prefill_pos : s.prefill_pos + self.n_batch
            ]
            ids[i, : len(chunk)] = chunk
            n_past[i] = s.prefill_pos
            chunk_lens[i] = len(chunk)
            mask[i] = True
        logits = self._dispatch(
            ids, n_past, window_bucket(gmax + self.n_batch, spec.n_ctx), mask
        )
        for i, ln in chunk_lens.items():
            s = self.slots[i]
            s.prefill_pos += ln
            s.n_past = s.prefill_pos
            s.last_logits = logits[i, ln - 1]
            if s.prefill_pos >= len(s.prefill_queue):
                s.prefilling = False

    def _global_decode(self, gmax: int) -> list:
        from llm_tpu.models.forward import window_bucket

        spec = self.spec
        ids = np.zeros((self.max_streams, 1), np.int32)
        n_past = np.zeros(self.max_streams, np.int32)
        mask = np.zeros(self.max_streams, bool)
        sampled = {}
        for i, s in self._decodable():
            tok = self._host_sample(s)
            sampled[i] = tok
            ids[i, 0] = tok
            n_past[i] = s.n_past
            mask[i] = True
        logits_g = self._dispatch_async(
            ids, n_past, window_bucket(gmax + 1, spec.n_ctx), mask
        )
        # token events fire while the device computes the NEXT logits
        # (see serve.Engine.step); last_logits refreshes after the force
        events, emitted = [], []
        for i, tok in sampled.items():
            s = self.slots[i]
            emitted.append((i, s))
            events.append(self._finish_token(i, s, tok, s.last_logits))
        logits = self._local_rows(logits_g)[:, 0, :]
        for i, s in emitted:
            s.last_logits = logits[i]
        return events

    def step(self) -> list:
        """One globally-coordinated engine step. EVERY host process must
        call step() in lockstep (the dispatches are collective)."""
        self._admit()
        events = self._drain_retired()
        self._steps += 1
        n_pref, _, gmax, _ = self._sync()
        if n_pref:
            self._global_prefill_chunk(gmax)
            events += self._drain_retired()
        _, n_dec, gmax2, _ = self._sync()
        if n_dec:
            events += self._global_decode(gmax2)
        return events

    def has_work_global(self) -> bool:
        return self._sync()[3] > 0

    def generate_all(self, requests, n_steps: int = 1) -> dict[int, str]:
        """Submit local requests, step in global lockstep until EVERY host
        drains, return local id -> text. n_steps > 1 uses the coordinated
        on-device multi-token decode (device_sampler required)."""
        ids = [self.submit(r) for r in requests]
        while self.has_work_global():
            if n_steps > 1:
                self.step_multi(n_steps)
            else:
                self.step()
        return {rid: "".join(self.finished[rid].text) for rid in ids}


# ---------------------------------------------------------------------------
# paged KV pools under the cross-host engine
#
# Each host owns a LOCAL physical page pool: the global pool's page axis is
# sharded over `data`, every host's tables address only its own pages (ids
# are host-local; each host's page 0 is its own trash page), and the
# engine dispatches ONE global SPMD program per step via shard_map with
# `data` MANUAL and `model` AUTOMATIC — page gathers/scatters are host-local
# array ops inside the manual region (no cross-host page traffic, ever),
# while the TP weight sharding still rides GSPMD within each host's ICI
# domain. Dummy rows (slots not written this dispatch) point at their
# stream's frontier: positions >= n_past are rewritten before they are ever
# read, and positions past the table redirect to the trash page
# (paged.py:paged_forward_batched).


from functools import partial as _partial

from jax.sharding import PartitionSpec as _P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


@_partial(jax.jit, static_argnums=(0, 6, 7, 8), donate_argnums=(5,))
def _mh_paged_step(
    spec, params, ids, n_past, tables, pool, window_pages, allow_kernel, mesh
):
    from llm_tpu.paged import PagedKVCache, paged_forward_batched

    pool_spec = PagedKVCache(
        _P(None, "data"), _P(None, "data"), _P(None, "data"), _P(None, "data")
    )
    fn = _shard_map(
        lambda p, i, n, t, c: paged_forward_batched(
            spec, p, i, n, t, c, window_pages, allow_kernel
        ),
        mesh=mesh,
        axis_names={"data"},
        in_specs=(_P(), _P("data"), _P("data"), _P("data"), pool_spec),
        out_specs=(_P("data"), _P("data"), pool_spec),
        check_vma=False,
    )
    return fn(params, ids, n_past, tables, pool)


def _sampler_structure_ints(per_slot) -> list:
    """Local contribution to the allgathered STATIC sampler structure:
    [any top-p, any min-p, any penalty, penalty window, any tail-free,
    any typical, any top-a, mirostat kind bits, mirostat m]. Every host
    must build the identical BatchedDeviceSampler (identical jitted
    program), so booleans agree by max, windows/m by max, and mirostat
    kinds as an OR'd bitmask (bit0 = kind 1, bit1 = kind 2; both set
    after the allgather = an invalid mixed batch)."""
    miro_bits = 0
    for d in per_slot:
        if d is not None and d.mirostat:
            miro_bits |= 1 << (d.mirostat - 1)
    return [
        int(any(d is not None and d.kind == "sample" and d.top_p < 1.0
                for d in per_slot)),
        int(any(d is not None and d.kind == "sample" and d.min_p > 0.0
                for d in per_slot)),
        int(any(d is not None and d.has_penalties for d in per_slot)),
        # last_n <= 0 = unbounded window: a large sentinel keeps the
        # cross-host max agreement monotone (unbounded beats any finite)
        max(((d.penalty_last_n if d.penalty_last_n > 0 else 1 << 30)
             for d in per_slot if d is not None and d.has_penalties),
            default=0),
        int(any(d is not None and d.kind == "sample"
                and d.tail_free_z < 1.0 for d in per_slot)),
        int(any(d is not None and d.kind == "sample"
                and d.typical_p < 1.0 for d in per_slot)),
        int(any(d is not None and d.kind == "sample"
                and d.top_a != (0.0, 0.0) for d in per_slot)),
        miro_bits,
        max((d.mirostat_m for d in per_slot
             if d is not None and d.mirostat == 1), default=100),
    ]


def _logprobs_local(active) -> int:
    """Local contribution to the agreed static logprobs_n: the max
    requested top-N, or -1 when no stream wants logprobs."""
    reqs = [
        s.request.logprobs for _, s in active
        if s.request.logprobs is not None
    ]
    return max(reqs) if reqs else -1


def _sampler_structure_cfg(g, col: int) -> dict:
    """Agreed BatchedDeviceSampler kwargs from the allgathered ints."""
    bits = int(np.bitwise_or.reduce(g[:, col + 7].astype(np.int64)))
    if bits == 3:
        raise ValueError(
            "streams mixing mirostat 1 and mirostat 2 cannot share one "
            "globally-coordinated decode block"
        )
    return {
        "any_top_p": bool(g[:, col].max()),
        "any_min_p": bool(g[:, col + 1].max()),
        "any_penalty": bool(g[:, col + 2].max()),
        "penalty_last_n": max(int(g[:, col + 3].max()), 1),
        "any_tail_free": bool(g[:, col + 4].max()),
        "any_typical": bool(g[:, col + 5].max()),
        "any_top_a": bool(g[:, col + 6].max()),
        "mirostat_kind": 2 if bits == 2 else (1 if bits == 1 else 0),
        "mirostat_m": int(g[:, col + 8].max()),
    }


@_partial(
    jax.jit, static_argnums=(0, 6, 7, 8, 11, 12, 14, 15),
    donate_argnums=(5,),
)
def _mh_paged_loop(
    spec, params, logits, n_past, tables, pool, n_steps, window_pages,
    sampler_cfg, key, values, allow_kernel, mesh, penalty_state=None,
    logprobs_n=None, return_state=False,
):
    from llm_tpu.paged import PagedKVCache, paged_decode_loop

    pool_spec = PagedKVCache(
        _P(None, "data"), _P(None, "data"), _P(None, "data"), _P(None, "data")
    )
    out_specs = (_P(None, "data"), _P("data"), _P("data"), pool_spec)
    if return_state:
        # the sampler-state pytree (penalty counts/ring/pos, mirostat mu)
        # is per-stream: every leaf leads with the data-sharded batch axis
        state_spec = jax.tree_util.tree_map(
            lambda _: _P("data"), penalty_state
        )
        if isinstance(penalty_state, dict) and "mu" in penalty_state:
            # the loop appends the per-step mu trajectory [n_steps, B]
            state_spec = dict(state_spec, mu_steps=_P(None, "data"))
        out_specs = out_specs + (state_spec,)
    if logprobs_n is not None:
        # per-step logprob arrays ride the stream (data) axis too
        out_specs = out_specs + (
            (_P(None, "data"), _P(None, "data"), _P(None, "data")),
        )
    fn = _shard_map(
        lambda p, lg, n, t, c, k, v, pst: paged_decode_loop(
            spec, p, lg, n, t, c, n_steps, window_pages,
            sampler_cfg, k, v, allow_kernel, pst, logprobs_n, return_state,
        ),
        mesh=mesh,
        axis_names={"data"},
        in_specs=(
            _P(), _P("data"), _P("data"), _P("data"), pool_spec, _P(),
            _P("data"), _P("data"),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    out = list(fn(
        params, logits, n_past, tables, pool, key, values, penalty_state
    ))
    from llm_tpu.models.forward import unpack_decode_out

    toks, last_logits, _, new_pool, fstate, lp = unpack_decode_out(
        out, return_state, logprobs_n
    )
    return toks, last_logits, new_pool, lp, fstate


class MultiHostPagedEngine(MultiHostEngine):
    """Cross-host continuous batching over host-local paged KV pools.

    Inherits all coordination (submit/_sync/step/generate_all) from
    MultiHostEngine; replaces the dense data-sharded slot cache with a
    per-host page pool + host-local tables/allocator, and the two dispatch
    sites with the manual-`data` shard_map'd paged step."""

    def __init__(
        self,
        model,
        mesh,
        global_streams: int = 8,
        kv_dtype="int8",
        n_batch: int = 64,
        page_size: int = 256,
        n_pages: Optional[int] = None,
    ):
        from jax.sharding import NamedSharding
        from llm_tpu.paged import PageAllocator, init_paged_cache
        from llm_tpu.parallel.sharding import shard_params

        self.model = model
        self.spec = model.spec
        self.mesh = mesh
        self.n_batch = n_batch
        self.global_streams = global_streams
        data = mesh.shape["data"]
        assert global_streams % data == 0, (global_streams, data)
        assert model.spec.n_ctx % n_batch == 0, (model.spec.n_ctx, n_batch)
        self.params = shard_params(model.params, mesh)

        # local row ownership from a probe array sharded over `data`
        probe = jax.jit(
            lambda: jnp.zeros(global_streams, jnp.int8),
            out_shardings=NamedSharding(mesh, _P("data")),
        )()
        rows = [
            (sl[0].start or 0, sl[0].stop or global_streams)
            for d, sl in probe.sharding.devices_indices_map(
                probe.shape
            ).items()
            if d.process_index == jax.process_index()
        ]
        self._row0 = min(r[0] for r in rows)
        self.max_streams = max(r[1] for r in rows) - self._row0

        self.page_size = page_size
        self.pages_per_stream = -(-self.spec.n_ctx // page_size)
        local_pages = (
            n_pages
            if n_pages is not None
            else 1 + self.max_streams * self.pages_per_stream
        )
        assert local_pages >= 2, "need a real page beside the trash page"
        pool_sh = NamedSharding(mesh, _P(None, "data"))
        self.pool = jax.jit(
            lambda: init_paged_cache(
                self.spec, data * local_pages, page_size, kv_dtype
            ),
            out_shardings=jax.tree_util.tree_map(
                lambda _: pool_sh,
                init_paged_cache(self.spec, 1, page_size, kv_dtype),
            ),
        )()
        self.allocator = PageAllocator(local_pages)
        self.tables = np.full(
            (self.max_streams, self.pages_per_stream),
            PageAllocator.TRASH,
            np.int32,
        )
        self.stream_pages: list[list[int]] = [
            [] for _ in range(self.max_streams)
        ]
        # inside the manual-`data` region the per-host compute is ordinary
        # single-device code UNLESS tensor parallelism rides the auto axis
        self._allow_kernel = mesh.shape.get("model", 1) == 1

        self.slots = [None] * self.max_streams
        self.pending = []
        self.finished = {}
        self._retired_events = []
        self._next_id = jax.process_index() * 1_000_000
        self._eot = model.eot_token_id()
        self._steps = 0

    # page bookkeeping (host-local) ----------------------------------------

    def _ensure_pages(self, slot: int, last_pos: int) -> None:
        from llm_tpu.paged import PageAllocator

        for j in range(last_pos // self.page_size + 1):
            if self.tables[slot, j] == PageAllocator.TRASH:
                (p,) = self.allocator.alloc(1)
                self.tables[slot, j] = p
                self.stream_pages[slot].append(p)

    def _on_slot_released(self, slot: int) -> None:
        from llm_tpu.paged import PageAllocator

        self.allocator.release(self.stream_pages[slot])
        self.stream_pages[slot] = []
        self.tables[slot, :] = PageAllocator.TRASH

    # dispatch --------------------------------------------------------------

    def _window_pages(self, gmax: int, extra: int) -> int:
        wp = max(1, -(-(gmax + extra) // self.page_size))
        return min(wp, self.pages_per_stream)

    def _paged_dispatch_async(self, ids: np.ndarray, n_past: np.ndarray,
                              wp: int):
        """Global logits, not yet forced (see _dispatch_async)."""
        logits, _, self.pool = _mh_paged_step(
            self.spec,
            self.params,
            self._to_global(ids, ("data",)),
            self._to_global(n_past, ("data",)),
            self._to_global(self.tables, ("data",)),
            self.pool,
            wp,
            self._allow_kernel,
            self.mesh,
        )
        return logits

    def _paged_dispatch(self, ids: np.ndarray, n_past: np.ndarray, wp: int):
        return self._local_rows(self._paged_dispatch_async(ids, n_past, wp))

    def _frontiers(self) -> np.ndarray:
        """Dummy-row n_past: every slotted stream's write positions start at
        its frontier (safe: rewritten before read, or trash-paged)."""
        n_past = np.zeros(self.max_streams, np.int32)
        for i, s in enumerate(self.slots):
            if s is not None:
                n_past[i] = s.prefill_pos if s.prefilling else s.n_past
        return n_past

    def _global_prefill_chunk(self, gmax: int) -> None:
        ids = np.zeros((self.max_streams, self.n_batch), np.int32)
        n_past = self._frontiers()
        chunk_lens = {}
        for i, s in enumerate(self.slots):
            if s is None or not s.prefilling:
                continue
            chunk = s.prefill_queue[
                s.prefill_pos : s.prefill_pos + self.n_batch
            ]
            try:
                self._ensure_pages(i, s.prefill_pos + len(chunk) - 1)
            except MemoryError:
                # no pages this step: the row runs as a dummy (frontier,
                # zero ids); deadlock rule matches Engine._advance_prefills
                s.kv_wait = True
                others = [
                    o for j, o in enumerate(self.slots)
                    if o is not None and j != i
                ]
                if not others or all(o.kv_wait for o in others):
                    self._retire(s, "kv_oom", slot=i)
                continue
            s.kv_wait = False
            ids[i, : len(chunk)] = chunk
            chunk_lens[i] = len(chunk)
        logits = self._paged_dispatch(
            ids, n_past, self._window_pages(gmax, self.n_batch)
        )
        for i, ln in chunk_lens.items():
            s = self.slots[i]
            s.prefill_pos += ln
            s.n_past = s.prefill_pos
            s.last_logits = logits[i, ln - 1]
            if s.prefill_pos >= len(s.prefill_queue):
                s.prefilling = False

    def _global_decode(self, gmax: int) -> list:

        ids = np.zeros((self.max_streams, 1), np.int32)
        n_past = self._frontiers()
        sampled = {}
        for i, s in self._decodable():
            tok = self._host_sample(s)
            try:
                self._ensure_pages(i, s.n_past)
            except MemoryError:
                self._retire(s, "kv_oom", slot=i)
                n_past[i] = 0
                continue
            sampled[i] = tok
            ids[i, 0] = tok
        # tables captured at dispatch: a retirement inside the event loop
        # cannot free a page this in-flight step still writes
        logits_g = self._paged_dispatch_async(
            ids, n_past, self._window_pages(gmax, 1)
        )
        events, emitted = [], []
        for i, tok in sampled.items():
            s = self.slots[i]
            emitted.append((i, s))
            events.append(self._finish_token(i, s, tok, s.last_logits))
        logits = self._local_rows(logits_g)[:, 0, :]
        for i, s in emitted:
            s.last_logits = logits[i]
        return events

    def step_multi(self, n_steps: int = 16) -> list:
        """Globally-coordinated paged on-device multi-token decode: the
        hosts agree on (sampler structure, max position, a page-feasible
        block length), pre-allocate local pages to cover the whole block,
        and dispatch ONE shard_map'd paged_decode_loop. Any host whose pool
        can't cover even a 2-step block forces the global per-token path
        (which retires kv_oom streams)."""
        from jax.experimental import multihost_utils

        from llm_tpu.ops.sampling import BatchedDeviceSampler, batched_sampler

        self._admit()
        events = self._drain_retired()
        self._steps += 1
        n_pref, _, gmax, _ = self._sync()
        if n_pref:
            self._global_prefill_chunk(gmax)
            events += self._drain_retired()

        active = self._decodable()
        per_slot = [None] * self.max_streams
        for i, s in active:
            ds = s.request.device_sampler
            assert ds is not None, "step_multi requires device_sampler"
            assert not ds.bias, "multi-host step_multi: bias unsupported"
            per_slot[i] = ds

        local = np.array(
            [
                len(active),
                int(any(d is not None and d.kind == "sample" for d in per_slot)),
                max((d.top_k for d in per_slot
                     if d is not None and d.kind == "sample"), default=0),
                max((s.prefill_pos if s.prefilling else s.n_past
                     for s in self.slots if s is not None), default=0),
                self._multi_feasible(active, n_steps),
                *_sampler_structure_ints(per_slot),
                _logprobs_local(active),
            ],
            np.int64,
        )
        if jax.process_count() == 1:
            g = local[None]
        else:
            g = np.asarray(multihost_utils.process_allgather(local))
        n_dec = int(g[:, 0].sum())
        if n_dec == 0:
            return events
        gmax2 = int(g[:, 3].max())
        n_steps = min(int(g[:, 4].min()), self.spec.n_ctx - 1 - gmax2)
        if n_steps <= 1:
            return events + self.step()
        try:
            cfg = BatchedDeviceSampler(
                sample=bool(g[:, 1].max()), top_k_max=int(g[:, 2].max()),
                bias_tokens=(), **_sampler_structure_cfg(g, 5),
            )
        except ValueError:
            return events + self.step()  # same agreed fallback on all hosts
        from llm_tpu.ops.sampling import ensure_value_keys

        # after the coordinated decision (see MultiHostEngine.step_multi)
        _, values = batched_sampler(per_slot, self.max_streams)
        values = ensure_value_keys(values, cfg, self.max_streams)
        for i, s in active:  # feasibility-checked above; cannot raise
            self._ensure_pages(
                i, min(s.n_past + n_steps, self.spec.n_ctx) - 1
            )

        logits = np.zeros((self.max_streams, self.spec.n_vocab), np.float32)
        n_past = self._frontiers()
        for i, s in active:
            logits[i] = s.last_logits

        lpn = int(g[:, 14].max())
        lpn = None if lpn < 0 else lpn
        key = jax.random.PRNGKey(self._steps)  # same on every host
        ret_state = cfg.mirostat_kind != 0
        toks, last_logits, self.pool, lp, fstate = _mh_paged_loop(
            self.spec,
            self.params,
            self._to_global(logits, ("data",)),
            self._to_global(n_past, ("data",)),
            self._to_global(self.tables, ("data",)),
            self.pool,
            n_steps,
            self._window_pages(gmax2, n_steps),
            cfg,
            key,
            self._to_global(
                {k: np.asarray(v) for k, v in values.items()}, ("data",)
            ),
            self._allow_kernel,
            self.mesh,
            self._sampler_state_global(cfg, active, gmax2),
            lpn,
            ret_state,
        )
        lp_l = (
            tuple(self._local_rows(a, axis=1) for a in lp)
            if lp is not None else None
        )
        toks_l = self._local_rows(toks, axis=1)  # [n_steps, B_local]
        ll_l = self._local_rows(last_logits)
        if fstate is not None:
            from llm_tpu.ops.sampling import store_mu

            store_mu(active, self._local_rows(fstate["mu_steps"], axis=1),
                     self._block_keeps(active, toks_l))
        return events + self._postprocess_multi(
            active, toks_l, ll_l, n_steps, lp_l
        )

    def _multi_feasible(self, active, n_steps: int) -> int:
        """Largest (halving) block length whose page demand fits the local
        pool; hosts with no active streams never constrain the minimum."""
        from llm_tpu.paged import PageAllocator

        if not active:
            return n_steps
        while n_steps > 1:
            need = 0
            for slot, s in active:
                last = min(s.n_past + n_steps, self.spec.n_ctx) - 1
                have = sum(
                    1 for j in range(last // self.page_size + 1)
                    if self.tables[slot, j] != PageAllocator.TRASH
                )
                need += last // self.page_size + 1 - have
            if need <= self.allocator.available:
                return n_steps
            n_steps //= 2
        return 0
