"""Compiled-block execution: fuse whole unroll schedules into one XLA program.

The reference (and our default driver mode) dispatches one update per inner
step from Python — fine on a local GPU, but on TPU the per-dispatch host
latency dominates once the per-step compute is fast. Because every quantity
that shapes the schedule (``unroll_steps``, ``gradient_accumulation``,
``roll_back``) is static config, the entire step recursion of
``Problem.step_normal`` / ``step_after_roll_back`` (reference
``problem.py:371-454``) can be *simulated on the host once*, yielding a
periodic event schedule, which is then traced into a single jitted block:
runs of identical leaf steps become ``lax.scan`` segments, parent steps with
their hypergradient solvers are inlined, roll-back becomes carrying the
pre-unroll pytree, and user hooks (``on_inner_loop_start``, callbacks)
execute inside the trace via the context binding.

One block = one steady-state period of the schedule = exactly one dispatch.
Numerics match driver mode (same update functions, same
per-step RNG folding, up to XLA fusion reassociation) — asserted in
tests/test_compile.py.

Warmup phases run in driver mode until the schedule reaches its steady
state (Engine.run_compiled); IterativeProblem unrolls are replayed from
block-locally tracked start states and batches. Remaining restriction:
hooks must be jnp-traceable (host-side side effects need driver mode).
"""

from dataclasses import dataclass, field, replace
from typing import List

import jax
import jax.numpy as jnp

from betty_tpu.problems.problem import _CtxBinding


# ---------------------------------------------------------------------------
# schedule simulation
# ---------------------------------------------------------------------------


@dataclass
class Event:
    name: str
    apply_update: bool
    advance_sched: bool
    inner_loop_start: bool = False
    rollback_recover: bool = False
    reuse_batch: bool = False
    count_offset: int = 0  # problem-local count at execution time (post-inc)
    # statically known that this recover's cache-creating inner_loop_start
    # precedes it within the block (unrotated schedules: always True); when
    # False the restore is gated on the carried validity flag at runtime
    cache_sure: bool = False


@dataclass
class _SimState:
    count: int = 0
    inner_loop_start: bool = True
    ready: List[bool] = field(default_factory=list)


class _Simulator:
    """Replays the driver recursion symbolically to extract the event list
    for one steady-state period."""

    MAX_ITERS = 4096

    def __init__(self, engine):
        self.engine = engine
        self.problems = {p.name: p for p in engine.problems}
        self.state = {
            p.name: _SimState(ready=[False] * len(p.children))
            for p in engine.problems
        }
        self.events: List[Event] = []

    def phase(self):
        return tuple(
            (
                s.count % (self.problems[n]._unroll_steps * self.problems[n].gas),
                s.inner_loop_start,
                tuple(s.ready),
            )
            for n, s in sorted(self.state.items())
        )

    def run(self):
        """Returns (events of one steady-state cycle, its length in engine
        iterations, the phase at the cycle start).

        The cycle need not pass through the t=0 phase: graphs with uneven
        fan-in can have a transient prefix (e.g. a parent's ``ready`` flags
        are never again all False simultaneously) — the engine drives that
        prefix in driver mode until the live phase matches the returned
        start phase. Among the cycle's possible start iterations, pick one
        that is *causally complete*: every hypergradient event must be
        preceded within the block by events of all its path intermediates
        (their current batches are staged per event — an upper stepping
        before a lower's first in-block event has no batch to read)."""
        def counts():
            return {n: s.count for n, s in self.state.items()}

        snaps = [(self.phase(), 0, counts())]  # after k iters: phase/ev/cnt
        index = {snaps[0][0]: 0}
        for it in range(self.MAX_ITERS):
            for leaf in self.engine.leaves:
                self.sim_step(leaf)
            ph = self.phase()
            if ph in index:
                j = index[ph]
                end_counts = counts()
                delta = {n: end_counts[n] - snaps[j][2][n]
                         for n in end_counts}
                return self._extract_cycle(snaps, j, it + 1 - j, delta)
            index[ph] = len(snaps)
            snaps.append((ph, len(self.events), counts()))
        raise RuntimeError(
            "Could not find a periodic schedule within "
            f"{self.MAX_ITERS} engine iterations; use driver mode."
        )

    def _extract_cycle(self, snaps, j, period, delta):
        ev_j, ev_end = snaps[j][1], len(self.events)
        for m in range(j, j + period):
            ph_m, ev_m, base_m = snaps[m]
            head = self.events[ev_m:ev_end]
            tail = self.events[ev_j:ev_m]  # wraps into the next period
            if not self._causally_complete(head + tail):
                continue
            # count_offset is consumed RELATIVE to the live counts at block
            # entry (counts0 + offset): rebase the absolute sim counts by
            # the rotation-start counts; wrapped events re-occur one period
            # later, so they additionally advance by the per-period delta
            out = [replace(e, count_offset=e.count_offset - base_m[e.name])
                   for e in head]
            out += [replace(e, count_offset=e.count_offset
                            + delta[e.name] - base_m[e.name])
                    for e in tail]
            return out, period, ph_m
        raise RuntimeError(
            "The schedule's steady-state cycle has no causally-complete "
            "block boundary (a hypergradient step would precede its path "
            "intermediates' batches in every rotation); use driver mode."
        )

    def _causally_complete(self, events):
        done = set()
        started = set()  # problems whose inner_loop_start occurred in-block
        for e in events:
            p = self.problems[e.name]
            if e.reuse_batch and e.name not in done:
                return False
            if p._paths and any(
                q.name not in done for q in p._path_intermediates()
            ):
                return False
            # ITD parents replay their children's batches collected since
            # the unroll start — the whole unroll (from its
            # inner_loop_start, which seeds itd_start) must sit inside the
            # block: a mid-window rotation has no replay starting point
            if any(
                hasattr(c, "replay_unroll") and not c._first_order
                and c.name not in started
                for c in p.children
            ):
                return False
            if e.inner_loop_start:
                started.add(e.name)
            done.add(e.name)
        return True

    # -- mirrors Problem.step -------------------------------------------
    def sim_step(self, p):
        self.sim_step_normal(p)
        s = self.state[p.name]
        if s.count % (p._unroll_steps * p.gas) == 0:
            self.sim_step_after_roll_back(p)

    def sim_step_normal(self, p):
        s = self.state[p.name]
        if not all(s.ready):
            return
        ev = Event(p.name, apply_update=False, advance_sched=not p._roll_back)
        if s.inner_loop_start:
            ev.inner_loop_start = True
            s.inner_loop_start = False
        s.count += 1
        ev.count_offset = s.count
        ev.apply_update = s.count % p.gas == 0
        self.events.append(ev)

        if s.count % (p._unroll_steps * p.gas) == 0:
            for parent in p.parents:
                idx = parent.children.index(p)
                self.state[parent.name].ready[idx] = True
                self.sim_step_normal(parent)
            s.inner_loop_start = True
        s.ready = [False] * len(p.children)

    def sim_step_after_roll_back(self, p):
        s = self.state[p.name]
        if not all(s.ready):
            return
        if p._roll_back:
            self.events.append(
                Event(
                    p.name,
                    apply_update=s.count % p.gas == 0,
                    advance_sched=True,
                    rollback_recover=True,
                    reuse_batch=True,
                    count_offset=s.count,
                )
            )
            for parent in p.parents:
                idx = parent.children.index(p)
                self.state[parent.name].ready[idx] = True
                self.sim_step_after_roll_back(parent)
        s.ready = [False] * len(p.children)


# ---------------------------------------------------------------------------
# segment compression
# ---------------------------------------------------------------------------


@dataclass
class Segment:
    events: List[Event]
    is_scan: bool

    @property
    def name(self):
        return self.events[0].name


MIN_SCAN_RUN = 4


def compress(events: List[Event], problems) -> List[Segment]:
    segments: List[Segment] = []
    i = 0
    while i < len(events):
        ev = events[i]
        p = problems[ev.name]
        scannable = (
            not ev.inner_loop_start
            and not ev.rollback_recover
            and not ev.reuse_batch
            and not p._paths
        )
        j = i
        if scannable:
            while (
                j + 1 < len(events)
                and events[j + 1].name == ev.name
                and events[j + 1].apply_update == ev.apply_update
                and events[j + 1].advance_sched == ev.advance_sched
                and not events[j + 1].inner_loop_start
                and not events[j + 1].rollback_recover
                and not events[j + 1].reuse_batch
            ):
                j += 1
        run = events[i : j + 1]
        if scannable and len(run) >= MIN_SCAN_RUN:
            segments.append(Segment(run, is_scan=True))
            i = j + 1
        else:
            segments.append(Segment([ev], is_scan=False))
            i += 1
    return segments


# ---------------------------------------------------------------------------
# block runner
# ---------------------------------------------------------------------------


class BlockRunner:
    """Executes the periodic schedule. ``scan_periods=K`` stacks K periods of
    batches and scans the whole period program — one host dispatch (and one
    batched host->device transfer) per K meta-periods, which amortizes tunnel
    and dispatch latency to near zero."""

    def __init__(self, engine, scan_periods: int = 1,
                 schedule_only: bool = False):
        """``schedule_only=True`` builds just the schedule simulation
        (events/period) without staging datasets — used by the engine's
        probe pass so the real runner's device-resident copies are the only
        ones alive."""
        self.engine = engine
        self.scan_periods = max(1, int(scan_periods))
        self.problems = {p.name: p for p in engine.problems}

        sim = _Simulator(engine)
        self.events, self.period, self.initial_phase = sim.run()
        if schedule_only:
            return
        # The roll-back cache is CARRIED through the block (and across
        # blocks): a causal rotation may place a window's recover before
        # its cache-creating inner_loop_start — the cache then comes from
        # the previous period (previous block / the driver warmup phase,
        # seeded from the live ``Problem._state_cache``). Mark the recovers
        # whose in-block start statically precedes them so the common
        # unrotated schedule pays no runtime validity select.
        # ``started`` holds problems whose cache is statically live: set at
        # their inner_loop_start, consumed (cleared, like driver
        # recover_states) by their recover — a second recover before the
        # next window start must NOT restore.
        started = set()
        for e in self.events:
            if e.rollback_recover:
                e.cache_sure = e.name in started
                started.discard(e.name)
            if e.inner_loop_start:
                started.add(e.name)
        self._rb_names = sorted(
            {e.name for e in self.events
             if self.problems[e.name]._roll_back}
        )
        self.segments = compress(self.events, self.problems)
        # count advancement per period (rollback re-steps do not advance)
        self.count_delta = {
            name: max(
                (e.count_offset for e in self.events if e.name == name),
                default=0,
            )
            for name in self.problems
        }
        # fast path: problems whose (single) loader is a device-resident
        # ArrayLoader feed the block INDICES only; the gathers run inside the
        # compiled block, so per-step data movement costs zero dispatches.
        from betty_tpu.data import ArrayLoader
        from betty_tpu.problems.problem import Problem as _ProblemBase

        self.fastpath = {}
        for name, p in self.problems.items():
            dl = p.train_data_loader
            if (
                dl is not None
                and len(dl) == 1
                and isinstance(dl[0], ArrayLoader)
                and dl[0].device
                and dl[0].drop_last
                # custom host-side batch logic can't ride in-device gathers;
                # subclasses whose override is configured off (e.g. augment
                # disabled) declare it via postprocess_is_identity
                and getattr(
                    dl[0], "postprocess_is_identity",
                    type(dl[0]).postprocess is ArrayLoader.postprocess,
                )
                and type(p).get_batch is _ProblemBase.get_batch
                # MRO-aware: an epoch_callback on ANY base class disables
                # the fast path (take_indices rolls epochs without hooks)
                and not p.is_implemented("epoch_callback")
                # multi-process: per-host dataset shards can't serve global
                # in-block gathers; those problems use the host-staging path
                and jax.process_count() == 1
            ):
                self.fastpath[name] = dl[0]
        staged = [
            n for n, p in self.problems.items()
            if n not in self.fastpath and p.train_data_loader is not None
            and any(isinstance(d, ArrayLoader) and d.device
                    for d in p.train_data_loader)
        ]
        # Measured staging cost (scripts/measure_block_staging.py, bilevel
        # fixture, unroll 4, K=8, CPU host): fastpath ships 0.625
        # transfers/period of int32 indices (640 B/period); host staging
        # ships 1.25 transfers/period of real batches (13.4 KB/period here
        # — scales with batch bytes); the 2-process fallback additionally
        # pays the make_array_from_process_local_data assembly + gloo
        # sync, measured 22.9 ms/period vs 0.22 single-process on the same
        # host. Numerics are identical in all three (test_multihost.py).
        if staged and engine.logger is not None:
            # device-resident data that can't ride the in-block gather path
            # (multi-loader / custom get_batch / epoch_callback / multi-host)
            # falls back to host staging — same numerics, more dispatches
            engine.logger.info(
                f"[Betty-TPU] compiled blocks: host-staging data path for "
                f"{staged} (in-block gather fast path active for "
                f"{sorted(self.fastpath)})"
            )
        if engine.mesh is None:
            self.datasets = {n: ld.arrays for n, ld in self.fastpath.items()}
        else:
            # under a mesh the dataset is replicated across devices; block
            # batches are produced by gathering with dp-sharded index rows
            # (see _device_put_segments), so each device materializes only
            # its batch shard — the fast path composes with dp/zero/fsdp
            from betty_tpu.parallel import replicated

            rep = replicated(engine.mesh)
            self.datasets = {
                n: tuple(jax.device_put(a, rep) for a in ld.arrays)
                for n, ld in self.fastpath.items()
            }

        donate = ()
        if engine.config.donate_state and not any(
            hasattr(p, "replay_unroll") for p in engine.problems
        ) and not self._rb_names:
            # (ITD problems may hold host references to pre-unroll states
            # captured during warmup/remainder driver phases; roll-back
            # graphs seed the carried cache from live state references at
            # the first block, which would alias the donated buffers)
            donate = (0,)
        self._jit_block = jax.jit(self._block, donate_argnums=donate)
        # device-side roll-back cache carried between blocks (seeded from
        # the driver's live caches at the first dispatch)
        self._live_cache = None
        self._live_valid = None

    # -- host side -------------------------------------------------------
    def collect_batches(self):
        """Pull one period's batches from the (host) data iterators as raw
        numpy: staging happens on the host so a whole block ships to the
        device in one transfer per segment (per-batch device_puts would pay
        the host->device round-trip once per inner step)."""
        import numpy as np

        def stack(*xs):
            # device-resident batches stack on device; host batches on host
            if isinstance(xs[0], jax.Array):
                return jnp.stack(xs)
            return np.stack(xs)

        seg_batches = []
        for seg in self.segments:
            p = self.problems[seg.name]
            if seg.name in self.fastpath:
                ld = self.fastpath[seg.name]
                if seg.events[0].reuse_batch:
                    seg_batches.append(None)
                elif seg.is_scan:
                    idx = ld.take_indices(len(seg.events))  # (n, B)
                    seg_batches.append(idx)
                    p.cur_batch = ("__fastpath_idx__", idx[-1])
                else:
                    idx = ld.take_indices(1)[0]  # (B,)
                    seg_batches.append(idx)
                    p.cur_batch = ("__fastpath_idx__", idx)
                continue
            p._batch_to_host = True
            try:
                if seg.is_scan:
                    batches = [p.get_batch() for _ in seg.events]
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: stack(*xs), *batches
                    )
                    seg_batches.append(stacked)
                    p.cur_batch = batches[-1]
                elif seg.events[0].reuse_batch:
                    seg_batches.append(None)
                else:
                    b = p.get_batch()
                    seg_batches.append(b)
                    p.cur_batch = b
            finally:
                p._batch_to_host = False
        return seg_batches

    def _gather(self, name, idx):
        """Materialize a fastpath batch from the device-resident dataset
        (inside the trace: zero extra dispatches)."""
        arrays = self.datasets[name]
        parts = tuple(a[idx] for a in arrays)
        return parts[0] if len(parts) == 1 else parts

    def _materialize_cur_batches(self):
        """Host-side: resolve fastpath cur_batch markers into real batches
        (used by validation and the driver remainder); a couple of gather
        dispatches per run_block, outside the hot loop."""
        for name, ld in self.fastpath.items():
            p = self.problems[name]
            cb = p.cur_batch
            if isinstance(cb, tuple) and len(cb) == 2 and \
                    isinstance(cb[0], str) and cb[0] == "__fastpath_idx__":
                p.cur_batch = self._gather(name, cb[1])

    def _device_put_segments(self, seg_batches, extra_leading_axes):
        """One transfer per segment, sharding the batch axis when a mesh is
        active (the batch axis sits behind the staging axes). Multi-process:
        each host stages its LOCAL batches; the global segment array
        (batch axis = local x process_count, dp-sharded across all hosts) is
        assembled via make_array_from_process_local_data."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.engine.mesh
        multiproc = jax.process_count() > 1
        out = []
        for seg, batch, lead in zip(self.segments, seg_batches, extra_leading_axes):
            if batch is None:
                out.append(None)
                continue
            if mesh is None:
                out.append(jax.tree_util.tree_map(
                    lambda x: x if isinstance(x, jax.Array)
                    else jax.device_put(x),
                    batch,
                ))
                continue

            def put(x, _lead=lead):
                # batch axis layout comes from the engine (("dcn","dp") on
                # multi-slice meshes, "dp" otherwise, replicated on pure
                # model-parallel meshes) — staging axes sit in front of it
                base = getattr(self.engine._batch_sharding, "spec", P())
                spec = P(*([None] * _lead), *base)
                sharding = NamedSharding(mesh, spec)
                if multiproc:
                    return jax.make_array_from_process_local_data(
                        sharding, np.asarray(x)
                    )
                return jax.device_put(x, sharding)

            out.append(jax.tree_util.tree_map(put, batch))
        return out

    def run_block(self):
        """Run ``scan_periods`` schedule periods in ONE dispatch."""
        import numpy as np

        engine = self.engine
        K = self.scan_periods
        if self.fastpath:
            # driver -> fastpath: start exactly where the live epoch stream
            # is (no re-served batches). Runs before EVERY block, not once:
            # driver-side consumption between blocks (warmup, a validation
            # that pulls training batches) moves the counters, and the
            # cursor must follow. Idempotent when nothing moved.
            for name, ld in self.fastpath.items():
                p = self.problems[name]
                ld.sync_cursor(p.epoch_counter[0], p.batches_served[0])
        per_period = [self.collect_batches() for _ in range(K)]
        if K == 1:
            seg_batches = per_period[0]
        else:
            # stack each segment's batches across periods (leading axis K)
            def stack(*xs):
                if isinstance(xs[0], jax.Array):
                    return jnp.stack(xs)
                return np.stack(xs)

            seg_batches = [
                None
                if per_period[0][i] is None
                else jax.tree_util.tree_map(
                    lambda *xs: stack(*xs),
                    *[per_period[k][i] for k in range(K)],
                )
                for i in range(len(self.segments))
            ]
        leads = [
            (1 if K > 1 else 0) + (1 if seg.is_scan else 0)
            for seg in self.segments
        ]
        seg_batches = self._device_put_segments(seg_batches, leads)
        # host values (not device arrays): under multi-process jit they are
        # broadcast as replicated inputs across all hosts' devices
        counts0 = {
            name: np.int32(self.problems[name]._count)
            for name in self.problems
        }
        if self._live_cache is None:
            # first block: seed from the driver's live roll-back caches
            # (warmup phases hold the pre-unroll state of any window the
            # rotation enters mid-flight); a problem that never started a
            # window has no cache — its recover is a no-op restore, exactly
            # like driver recover_states on an empty cache
            self._live_cache, self._live_valid = {}, {}
            for name in self._rb_names:
                p = self.problems[name]
                has = p._state_cache is not None
                self._live_cache[name] = (
                    p._state_cache if has else engine.states[name]
                )
                self._live_valid[name] = np.bool_(has)
        # abstract arg shapes for AOT cost analysis (bench.py MFU line);
        # ShapeDtypeStructs stay valid even when the call donates its inputs
        self._last_abstract_args = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x,
            (engine.states, self._live_cache, self._live_valid,
             seg_batches, counts0, self.datasets),
        )
        new_states, self._live_cache, self._live_valid, last_loss = (
            self._jit_block(
                engine.states, self._live_cache, self._live_valid,
                seg_batches, counts0, self.datasets,
            )
        )
        engine.states = new_states
        self._materialize_cur_batches()
        for name, p in self.problems.items():
            p._count += self.count_delta[name] * K
        # fastpath -> driver: fast-forward the live iterator and epoch
        # counter so any subsequent driver iterations (remainder, a later
        # validation that consumes training batches) continue the stream.
        # Fastpath problems have no epoch_callback (selection requires it),
        # so skipping per-epoch callbacks for in-block epochs loses nothing.
        for name, ld in self.fastpath.items():
            p = self.problems[name]
            epoch, served = ld.cursor_position()
            if epoch != p.epoch_counter[0]:
                p.epoch_counter[0] = epoch
                ld.set_epoch(epoch)
            p.batches_served[0] = served
            p.train_data_iterator[0] = ld.iter_from(epoch, served)
        return last_loss

    def finalize(self):
        """Sync the device-side roll-back cache back into the problems'
        live ``_state_cache`` so subsequent driver-mode phases (remainder
        iterations, checkpointing) see the in-block window state. One tiny
        bool readback per roll-back problem, once per block phase."""
        if self._live_cache is None:
            return
        for name in self._rb_names:
            p = self.problems[name]
            p._state_cache = (
                self._live_cache[name]
                if bool(self._live_valid[name]) else None
            )

    # -- traced block ------------------------------------------------------
    def _block(self, states, cache, valid, seg_batches, counts0, datasets):
        if self.scan_periods == 1:
            return self._one_period(
                states, cache, valid, seg_batches, counts0, datasets
            )

        ks = jnp.arange(self.scan_periods, dtype=jnp.int32)

        def period_body(carry, xs):
            per_seg, k = xs
            st, ca, va = carry
            counts_k = {
                n: counts0[n] + k * self.count_delta[n] for n in counts0
            }
            st, ca, va, last_loss = self._one_period(
                st, ca, va, per_seg, counts_k, datasets
            )
            return (st, ca, va), last_loss

        # the validity flags enter as host bools; the carry needs arrays
        valid = {n: jnp.asarray(v) for n, v in valid.items()}
        (states, cache, valid), losses = jax.lax.scan(
            period_body, (states, cache, valid), (seg_batches, ks)
        )
        last_loss = jax.tree_util.tree_map(lambda x: x[-1], losses)
        return states, cache, valid, last_loss

    def live_phase(self):
        """Current host phase of the engine's problems (for warmup
        alignment: driver mode runs until this matches the simulator's
        steady-state initial phase)."""
        return tuple(
            (
                s_count % (p._unroll_steps * p.gas),
                p._inner_loop_start,
                tuple(p.ready),
            )
            for name, p in sorted(self.problems.items())
            for s_count in (p._count,)
        )

    def _one_period(self, states, cache, valid, seg_batches, counts0,
                    datasets):
        cur_batches = {}
        last_loss = {}
        # ITD bookkeeping: per IterativeProblem child, the unroll start state
        # and batches consumed since, assembled into the parent's itd_data
        itd_start = {}
        itd_start_count = {}
        itd_batches = {}
        itd_names = {
            name
            for name, p in self.problems.items()
            if hasattr(p, "replay_unroll") and not p._first_order
        }

        def collect_itd(name):
            parts = itd_batches[name]
            if len(parts) == 1:
                batches = parts[0]
            else:
                batches = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *parts
                )
            start = itd_start[name]
            return {
                "start_params": start["params"],
                "start_opt_state": start["opt_state"],
                "start_sched_step": start["sched_step"],
                "start_extra": start["extra"],
                "start_count": itd_start_count[name],
                "batches": batches,
            }

        def gather(name, idx):
            arrays = datasets[name]
            parts = tuple(a[idx] for a in arrays)
            return parts[0] if len(parts) == 1 else parts

        for seg, seg_batch in zip(self.segments, seg_batches):
            p = self.problems[seg.name]
            base_key = jax.random.PRNGKey(p._rng_seed)

            if seg.name in self.fastpath and seg_batch is not None:
                # indices -> batches, gathered inside the compiled block
                seg_batch = gather(seg.name, seg_batch)

            if seg.is_scan:
                upd = p.build_update_fn(
                    apply_update=seg.events[0].apply_update,
                    advance_sched=seg.events[0].advance_sched,
                )
                offsets = jnp.asarray(
                    [e.count_offset for e in seg.events], jnp.int32
                )

                # rng parity with driver mode: fold the *absolute* count
                # (counts0 + in-block offset), exactly as one_step_descent.
                def body(carry, xs, _upd=upd, _base=base_key, _n=seg.name):
                    batch, off = xs
                    rng = jax.random.fold_in(_base, counts0[_n] + off)
                    return _upd(carry, batch, {}, {}, rng)

                states, losses = jax.lax.scan(
                    body, states, (seg_batch, offsets)
                )
                cur_batches[seg.name] = jax.tree_util.tree_map(
                    lambda x: x[-1], seg_batch
                )
                last_loss[seg.name] = jax.tree_util.tree_map(
                    lambda x: x[-1], losses
                )
                if seg.name in itd_names:
                    itd_batches.setdefault(seg.name, []).append(seg_batch)
                continue

            ev = seg.events[0]

            if ev.inner_loop_start:
                states = self._run_inner_loop_start(p, states)
                if p._roll_back:
                    cache = {**cache, p.name: states[p.name]}
                    valid = {**valid, p.name: jnp.asarray(True)}
                if seg.name in itd_names:
                    # differentiation starting point for the ITD replay
                    # (captured after the hook, like the eager driver);
                    # the window's first micro-step runs at count_offset,
                    # so the pre-window count is one less
                    itd_start[seg.name] = states[seg.name]
                    itd_start_count[seg.name] = jnp.asarray(
                        counts0[seg.name] + ev.count_offset - 1, jnp.int32
                    )
                    itd_batches[seg.name] = []

            if ev.rollback_recover:
                # restore the pre-unroll state; when the rotation put this
                # recover before its in-block cache event, the cache comes
                # from the carry (previous period / driver warmup) and may
                # be empty for a never-started window — gate on validity,
                # matching driver recover_states' empty-cache no-op
                if ev.cache_sure:
                    restored = cache[p.name]
                else:
                    cv = valid[p.name]
                    restored = jax.tree_util.tree_map(
                        lambda c, s: jnp.where(cv, c, s),
                        cache[p.name], states[p.name],
                    )
                states = {**states, p.name: restored}
                valid = {**valid, p.name: jnp.asarray(False)}

            if ev.reuse_batch:
                batch = cur_batches[p.name]
            else:
                batch = seg_batch
                cur_batches[p.name] = batch
                if seg.name in itd_names and not ev.rollback_recover:
                    itd_batches.setdefault(seg.name, []).append(
                        jax.tree_util.tree_map(lambda x: x[None], batch)
                    )

            path_batches = {
                q.name: cur_batches[q.name] for q in p._path_intermediates()
            }
            itd_data = {
                c.name: collect_itd(c.name)
                for c in p.children
                if c.name in itd_names
            }
            rng = jax.random.fold_in(base_key, counts0[p.name] + ev.count_offset)
            upd = p.build_update_fn(
                apply_update=ev.apply_update, advance_sched=ev.advance_sched
            )
            states, loss = upd(states, batch, path_batches, itd_data, rng)
            last_loss[p.name] = loss

        return states, cache, valid, last_loss

    def _run_inner_loop_start(self, p, states):
        """Execute the user's on_inner_loop_start hook inside the trace."""
        if not p.is_implemented("on_inner_loop_start"):
            return states
        import betty_tpu.problems.problem as problem_mod

        ctx = {
            name: {"params": s["params"], "extra": s["extra"]}
            for name, s in states.items()
        }
        with _CtxBinding(ctx, None, None):
            p.on_inner_loop_start()
            # copy back every problem's entry: hooks may set_params on
            # OTHER problems too (cross-problem warm start), and driver
            # mode applies those — block mode must match
            final_ctx = problem_mod._TRACE_CTX
        return {
            name: {**states[name], "params": final_ctx[name]["params"],
                   "extra": final_ctx[name]["extra"]}
            for name in states
        }
