"""Real<->complex packing at jit boundaries.

The axon TPU backend in this environment cannot transfer complex arrays
between host and device (UNIMPLEMENTED), while complex arithmetic inside a
compiled program works fine. All TPU-facing entry points therefore exchange
complex fields as a stacked real pair (2, ...) = (real, imag) and convert
inside the jitted program. On CPU/GPU these helpers are cheap no-op-ish
reshapes, so the same entry points work everywhere.
"""

import jax
import jax.numpy as jnp

__all__ = ["pack_complex", "unpack_complex", "pack_tree", "unpack_tree",
           "stage_complex"]


def stage_complex(x, dtype):
    """`jnp.asarray(x, dtype)` that also works for HOST complex arrays on
    backends that cannot transfer complex (axon): the real and imaginary
    parts cross the boundary as separate real transfers and recombine on
    device. Device arrays and real targets pass straight through."""
    import numpy as np

    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        rdtype = np.empty((), dtype).real.dtype
        re = jnp.asarray(np.ascontiguousarray(x.real), rdtype)
        im = jnp.asarray(np.ascontiguousarray(x.imag), rdtype)
        return jax.lax.complex(re, im).astype(dtype)
    return jnp.asarray(x, dtype)


def pack_complex(z):
    """complex (...) -> real (2, ...). Real arrays pass through unchanged."""
    if jnp.iscomplexobj(z):
        return jnp.stack([jnp.real(z), jnp.imag(z)])
    return z


def unpack_complex(rz):
    """real (2, ...) -> complex (...)."""
    return jax.lax.complex(rz[0], rz[1])


def pack_tree(tree):
    return jax.tree.map(pack_complex, tree)


def unpack_tree(tree, template):
    """Unpack leaves that were complex in `template` (a pytree of dtypes)."""
    return jax.tree.map(
        lambda rz, t: unpack_complex(rz) if jnp.iscomplexobj(t) else rz,
        tree, template)
