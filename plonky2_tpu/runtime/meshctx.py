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


_REPLICATE_CACHE = {}


def _replicator(device_ids_and_devs):
    """One cached jitted identity-with-replicated-output per device set.

    jax.jit caches its traced/compiled executables per input aval, so a
    single jit object per device set suffices — building a fresh jit per
    call would retrace/relower every fetch (~90 ms/dispatch through the
    TPU tunnel) and never hit the dispatch cache.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    key = tuple(d.id for d in device_ids_and_devs)
    fn = _REPLICATE_CACHE.get(key)
    if fn is None:
        mesh = Mesh(np.array(device_ids_and_devs), ("all",))
        fn = jax.jit(lambda a: a,
                     out_shardings=NamedSharding(mesh, PartitionSpec()))
        _REPLICATE_CACHE[key] = fn
    return fn


def host_get(tree):
    """`jax.device_get` that also works across processes.

    Under a multi-process mesh (`jax.distributed`), jitted outputs can be
    sharded over devices this process cannot address; fetching them raises.
    Replicate such arrays with a collective all-gather first (every process
    runs the same SPMD program, so every process participates), then fetch.
    Single-process arrays pass straight through.

    LOCKSTEP REQUIREMENT: the replication is a collective — every process
    in the mesh must reach the same host_get calls in the same order, or
    the backend's collective rendezvous times out (gloo: ~30 s, then an
    error — divergence surfaces as a timeout, not a silent hang).  Lazily
    cached call sites (PolynomialBatch.polynomials/.leaves, MerkleTree
    query prefetch) must therefore be driven by process-uniform control
    flow — the prover guarantees this because Fiat–Shamir challenges are
    identical on every process.

    Memory note: replication materializes a full copy on every device; the
    prover only routes small transcript objects (caps, final poly, query
    rows — <1 MB) through here, never whole LDE matrices.
    """
    import jax

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            devs = sorted(x.sharding.device_set, key=lambda d: d.id)
            return _replicator(tuple(devs))(x)
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
