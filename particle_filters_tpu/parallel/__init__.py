"""Particle-axis data parallelism over a ``jax.sharding.Mesh``.

The reference has no distributed backend at all (SURVEY.md §2.4); the
TPU-native equivalent is SPMD over a mesh ``('batch', 'particles')``:
per-particle propagate/weight are local, weight normalization / ESS /
moments are ``psum`` over ICI, and resampling ancestry crosses shards via
``all_gather`` or the memory-bounded neighbor exchange. Four filter
families ride the mesh: the generic SIR (``sharded.py``), the flagship
fused Pallas path (``fused_sharded.py``), the EDH/LEDH particle-flow
filters (``flow_sharded.py``), and differentiable-PF training
(``dpf_sharded.py``).
"""

from particle_filters_tpu.parallel.mesh import make_mesh
from particle_filters_tpu.parallel.sharded import (
    make_sharded_pf_run,
    shard_pf_state,
)
from particle_filters_tpu.parallel.dpf_sharded import (
    make_sharded_dpf_train_step,
    sharded_soft_resample,
)
from particle_filters_tpu.parallel.distributed_resample import (
    neighbor_exchange_systematic_resample,
)
from particle_filters_tpu.parallel.fused_sharded import (
    make_sharded_fused_init,
    make_sharded_fused_pf,
    make_sharded_fused_run,
    make_sharded_fused_step,
)
from particle_filters_tpu.parallel.flow_sharded import (
    make_sharded_flow_run,
    shard_flow_state,
)

__all__ = [
    "make_mesh",
    "make_sharded_pf_run",
    "shard_pf_state",
    "make_sharded_dpf_train_step",
    "sharded_soft_resample",
    "neighbor_exchange_systematic_resample",
    "make_sharded_fused_pf",
    "make_sharded_fused_init",
    "make_sharded_fused_run",
    "make_sharded_fused_step",
    "make_sharded_flow_run",
    "shard_flow_state",
]
