"""Multi-chip / multi-host scale-out: data parallelism over a device mesh.

The reference's entire scale-out story is a pthread pool over reads on one
host (reference src/main.c:273-291,396-426); reads are fully independent.
The TPU-native equivalent (SURVEY.md §5.8): a 1-D 'dp' mesh over all chips,
each host streaming its own input shard; padded read/alignment batches are
sharded over 'dp', kernels run under jit with explicit shardings, and the
only collectives are end-of-stream stats reductions (psum) and the output
merge, which stays host-side per-shard (order within a shard = input order,
matching the reference's per-chunk ordering guarantee).
"""

from __future__ import annotations


from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


# --- active mesh registry -------------------------------------------------
#
# The production kernels (ops/wavefront.py, ops/msa_device.py) consult this
# to (a) scale their fixed batch shapes by the mesh size and (b) route
# their pallas calls through jax.shard_map over the 'dp' axis.  One mesh
# per process: the engine installs it at construction (make_engine).

_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def active_mesh_n() -> int:
    return 1 if _ACTIVE_MESH is None else int(_ACTIVE_MESH.devices.size)


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading (batch) axis sharded over 'dp'."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def pad_batch_for_mesh(mesh: Mesh, n: int) -> int:
    """Round a batch size up so it divides evenly over the mesh."""
    d = mesh.devices.size
    per = 8  # sublane granularity inside the kernels
    step = d * per
    return max(step, ((n + step - 1) // step) * step)


def sharded_align_step(mesh: Mesh, scores: Tuple[int, int, int, int]):
    """Build the jitted data-parallel alignment step: padded (q, t) batches
    sharded over 'dp', per-problem results sharded the same way, plus a
    psum-reduced global stats vector (total identity, total score) — the
    collective rides the mesh's ICI axis."""
    from ..ops.ksw2_jax import _extz_one, _backtrack_one

    def step(q, qlen, t, tlen, qle):
        n_rows = q.shape[1] + t.shape[1] - 1

        def one(qq, tt, ql, tl, qe_):
            best, dirs = _extz_one(qq, tt, ql, tl, True, n_rows, scores)
            iden, tleft = _backtrack_one(dirs, qq, tt, ql, tl, qe_)
            return best[3], iden, tleft

        score, iden, tleft = jax.vmap(one)(
            q.astype(jnp.int32), t.astype(jnp.int32), qlen, tlen, qle
        )
        stats = jnp.stack([jnp.sum(iden), jnp.sum(score)])
        return score, iden, tleft, stats

    in_spec = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(in_spec,) * 5,
        out_shardings=(in_spec, in_spec, in_spec, rep),
    )


def host_read_shard(reader: Iterator, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> Iterator:
    """Multi-host input sharding: host i consumes reads i, i+P, i+2P, ...
    Output files are per-host; concatenating them in host order preserves a
    deterministic global order (SURVEY.md §5.8's cheaper, reference-faithful
    choice: ordering matters only within a shard assignment)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    for i, rec in enumerate(reader):
        if i % pc == pi:
            yield rec


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap for multi-host pods; no-op when single."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
