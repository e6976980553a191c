"""Mesh-sharding context for the prover's device arrays.

SURVEY §2f: the multi-chip axes are data-parallel (polynomial batch) and
intra-NTT (domain).  Rather than a parallel code path, the prover's device
entry points consult this context when placing arrays: inputs get a
NamedSharding over the active mesh's "d" axis (poly-length / LDE-row /
chunk axes respectively) and XLA's SPMD partitioner propagates the
sharding through the exact same jitted programs — collectives (all-to-all
inside the four-step NTT transposes, all-gathers at the Merkle leaf
transpose) are inserted by the compiler, not hand-written.

Usage::

    with mesh_sharding(Mesh(jax.devices(), ("d",))):
        proof = session.prove(pw)
"""
from __future__ import annotations

import contextlib
from typing import Optional

_STATE = {"mesh": None}


def active_mesh():
    return _STATE["mesh"]


@contextlib.contextmanager
def mesh_sharding(mesh):
    old = _STATE["mesh"]
    _STATE["mesh"] = mesh
    try:
        yield
    finally:
        _STATE["mesh"] = old


def host_get(tree):
    """`jax.device_get` that also works across processes.

    Under a multi-process mesh (`jax.distributed`), jitted outputs can be
    sharded over devices this process cannot address; fetching them raises.
    Replicate such arrays with a collective all-gather first (every process
    runs the same SPMD program, so every process participates), then fetch.
    Single-process arrays pass straight through.
    """
    import jax

    import numpy as np

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            devs = np.array(sorted(x.sharding.device_set, key=lambda d: d.id))
            mesh = Mesh(devs, ("all",))
            return jax.jit(lambda a: a,
                           out_shardings=NamedSharding(mesh,
                                                       PartitionSpec()))(x)
        return x

    return jax.device_get(jax.tree_util.tree_map(fix, tree))


def put_array(arr, axis: Optional[int]):
    """device_put one array, sharded like :func:`put_pair`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = _STATE["mesh"]
    if mesh is None:
        return jax.device_put(jnp.asarray(arr))
    spec = [None] * arr.ndim
    if axis is not None and arr.shape[axis] % mesh.devices.size == 0:
        spec[axis] = "d"
    return jax.device_put(jnp.asarray(arr),
                          NamedSharding(mesh, PartitionSpec(*spec)))


def put_pair(pair, axis: Optional[int]):
    """device_put a GF pair, sharding `axis` over the mesh's "d" axis when
    a mesh is active (replicated when axis is None)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = _STATE["mesh"]
    if mesh is None:
        return (jax.device_put(jnp.asarray(pair[0])),
                jax.device_put(jnp.asarray(pair[1])))
    ndim = pair[0].ndim
    spec = [None] * ndim
    if axis is not None and pair[0].shape[axis] % mesh.devices.size == 0:
        spec[axis] = "d"
    sharding = NamedSharding(mesh, PartitionSpec(*spec))
    return (jax.device_put(jnp.asarray(pair[0]), sharding),
            jax.device_put(jnp.asarray(pair[1]), sharding))
