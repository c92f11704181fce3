"""Sharded flagship path: fused Pallas SIR step under ``shard_map``.

Composes the two fastest kernels in the framework across a device mesh —
the fused propagate+weight Pallas step (``ops/fused_pf.py``: on-chip PRNG,
lazy 2-scalar weight normalization, exact blockwise moments) and the
blocked systematic resample (``ops/resample_pallas.py``) — so the
north-star single-chip number scales over the ``particles`` mesh axis:

- per shard: one fused kernel call over the LOCAL particle block, with the
  (shard, block) pair seeding a distinct on-chip PRNG stream from the SAME
  replicated step seed;
- weight partials: the per-block (max, Σe, Σe², Σe·x, Σe·x⊗x) partials
  combine exactly across shards with one pmax + psum pair
  (``ops/fused_pf._combine_partials``) — log-normalizer, ESS and posterior
  moments are global, riding ICI;
- ESS-triggered resampling: either the exact all_gather ancestry (each
  shard runs the deterministic-per-key global resample through the blocked
  Pallas kernel and keeps its slice) or the memory-bounded ±radius
  neighbor exchange with its in-graph exact rescue
  (``parallel/distributed_resample.py``).

This is the SMC analog of scaling the hot training step over a mesh
(SURVEY.md §2.4: the particle axis is the DP/SP axis); the op being scaled
is the reference's sequential per-particle walk,
``/root/reference/models/particle_filter.py:146-171``.

Statistical (not bitwise) equivalence to the single-device fused filter:
the per-(shard, block) PRNG streams and the shard-concatenated particle
order differ from the single-device layout, so trajectories are different
draws of the same filter — ``tests/unit/test_fused_sharded.py`` pins
moment/ESS/evidence agreement on the SV model, and exact agreement of the
deterministic pieces (partial combining) across shard counts.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particle_filters_tpu.ops.fused_pf import FusedSIRFilter


def make_sharded_fused_pf(
    g_vec: Callable,
    obs_loglik_vec: Callable,
    Q,
    *,
    Np: int,
    mesh: Mesh,
    axis: str = "particles",
    resample_thresh: float = 0.5,
    block: int = 65536,
    distributed_resample: str = "all_gather",
    neighbor_radius: int = 2,
) -> FusedSIRFilter:
    """A :class:`FusedSIRFilter` configured for ``mesh``'s ``axis``.

    ``Np`` is the GLOBAL particle count; it must split evenly over the
    axis. The returned filter's methods must run inside ``shard_map`` —
    use :func:`make_sharded_fused_init` / :func:`make_sharded_fused_run`.
    """
    n_shards = mesh.shape[axis]
    if Np % n_shards != 0:
        raise ValueError(f"Np={Np} must divide over {n_shards} shards.")
    n_local = Np // n_shards
    return FusedSIRFilter(
        g_vec,
        obs_loglik_vec,
        Q,
        Np=n_local,
        resample_thresh=resample_thresh,
        block=min(block, n_local),
        axis_name=axis,
        n_shards=n_shards,
        distributed_resample=distributed_resample,
        neighbor_radius=neighbor_radius,
    )


def _state_specs(pf: FusedSIRFilter, axis: str):
    """Carry partition specs: particle/weight blocks are sharded along
    their LANE (column) axis — the kernel layout keeps particles on the
    last dim — and the two lazy-normalization scalars are replicated."""
    return (P(None, axis), P(None, axis), P())


def make_sharded_fused_init(pf: FusedSIRFilter, mesh: Mesh):
    """Jitted ``init(key, mean, cov) -> state`` with the particle axis
    sharded: each shard draws its local block from the replicated key
    (folded with the shard index inside ``FusedSIRFilter.initialize``)."""
    axis = pf.axis_name
    specs = _state_specs(pf, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=specs,
        check_vma=False,
    )
    def _init(key, mean, cov):
        return pf.initialize(key, mean, cov)

    return jax.jit(_init)


def make_sharded_fused_run(pf: FusedSIRFilter, mesh: Mesh):
    """Jitted ``run(key, state, zs) -> (state, history)`` over the mesh.

    ``pf`` must come from :func:`make_sharded_fused_pf`. The history is
    replicated (global moments/ESS/evidence + the resample/exchange
    flags), identical in schema to the single-device fused history.
    """
    axis = pf.axis_name
    if axis is None:
        raise ValueError("pf must be built with make_sharded_fused_pf.")
    specs = _state_specs(pf, axis)
    hist_spec = {
        "mean": P(),
        "cov": P(),
        "ess": P(),
        "resampled": P(),
        "log_evidence": P(),
        "exchange_ok": P(),
    }

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(specs, hist_spec),
        check_vma=False,
    )
    def _run(key, state, zs):
        return pf.run(key, state, zs)

    return jax.jit(_run)


def make_sharded_fused_step(pf: FusedSIRFilter, mesh: Mesh):
    """Jitted single ``step(key, state, z) -> (state, info)`` over the
    mesh — the sharded twin of ``FusedSIRFilter.step`` (used by the graft
    entry's multichip dryrun and latency-sensitive drivers)."""
    axis = pf.axis_name
    if axis is None:
        raise ValueError("pf must be built with make_sharded_fused_pf.")
    specs = _state_specs(pf, axis)
    info_spec = {
        "mean": P(),
        "cov": P(),
        "ess": P(),
        "resampled": P(),
        "log_evidence": P(),
        "exchange_ok": P(),
    }

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P()),
        out_specs=(specs, info_spec),
        check_vma=False,
    )
    def _step(key, state, z):
        return pf.step(key, state, z)

    return jax.jit(_step)
