"""Trajectory engine: a whole run is ONE jitted scan.

The reference's drivers loop in C++ with per-step kernel launches and stream
snapshots to the host (nlse_dev.hpp:323-334); here the outer scan over
snapshot intervals and the inner fori_loop over steps compile into a single
XLA program, and the snapshot stack comes back as one device array.

Snapshot cadence parity (e.g. host/drivers/kg_driver.cpp:105-121): snapshot 0
is the initial condition; snapshot k is the state after k*snapshot_freq steps,
k = 1..num_snapshots-1. The reference computes nt-1 steps but discards the
trailing (nt - (num_snapshots-1)*freq - 1) of them — we simply don't run them.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["evolve", "simulate"]


def evolve(step_fn, state0, num_snapshots, snapshot_freq, observe=None):
    """Run (num_snapshots-1) * snapshot_freq steps, recording snapshots.

    Args:
      step_fn: (state, step_index) -> state; step_index counts from 1 as in the
        reference drivers (used e.g. for stochastic noise keys and the sEWI
        bootstrap on step 1).
      state0: initial solver state (any pytree).
      observe: state -> snapshot pytree; defaults to identity.

    Returns:
      Snapshot pytree with a leading axis of length num_snapshots; entry 0 is
      observe(state0).
    """
    if observe is None:
        observe = lambda s: s

    def outer(carry, _):
        state, idx = carry

        def inner(i, st):
            return step_fn(st, idx + i)

        state = lax.fori_loop(0, snapshot_freq, inner, state)
        return (state, idx + snapshot_freq), observe(state)

    (_, _), snaps = lax.scan(outer, (state0, 1),
                             None, length=num_snapshots - 1)
    first = jax.tree.map(lambda x: jnp.asarray(x)[None], observe(state0))
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                        first, snaps)


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def simulate(step_fn, state0, num_snapshots, snapshot_freq, observe=None):
    """Jitted evolve; step_fn/observe must be hashable (e.g. module functions
    or functools.partial closures built once)."""
    return evolve(step_fn, state0, num_snapshots, snapshot_freq, observe)
