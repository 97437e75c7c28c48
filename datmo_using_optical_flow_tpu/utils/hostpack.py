"""Single-transfer host mirroring of device pytrees.

Through the TPU dispatch tunnel a device->host readback costs ~28 ms of
latency *per array*, so ``jax.device_get`` on a many-leaf pytree (e.g. the
per-pair :class:`~datmo_using_optical_flow_tpu.models.optical_flow_datmo.StepOutputs`)
pays that latency once per leaf and dominates the artifact-mirroring cost of
the streaming runners.  :class:`HostPacker` flattens a pytree into ONE flat
f32 device buffer (ints/bools bitcast, so the packing is lossless) with a
single jitted concat, and reconstructs the numpy pytree host-side from the
single transferred vector.

Layout is fixed per tree structure; build one packer per (pipeline, config)
and reuse it for every frame.  Buffers from several frames can be stacked
device-side and transferred together (:meth:`HostPacker.stack`) to amortize
the round trip further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _to_f32_words(x: jnp.ndarray) -> jnp.ndarray:
    """Losslessly reinterpret any supported leaf as flat f32 words."""
    if x.dtype in (jnp.bool_, jnp.uint8, jnp.int8, jnp.int16, jnp.uint16):
        x = x.astype(jnp.int32)
    if x.dtype == jnp.float32:
        return x.reshape(-1)
    if x.dtype in (jnp.int32, jnp.uint32):
        return lax.bitcast_convert_type(x, jnp.float32).reshape(-1)
    raise TypeError(f"HostPacker: unsupported leaf dtype {x.dtype}")


class HostPacker:
    """Pack/unpack a fixed-structure pytree through one flat f32 buffer."""

    def __init__(self, example_tree):
        leaves, self._treedef = jax.tree.flatten(example_tree)
        self._specs = [(tuple(l.shape), jnp.dtype(l.dtype)) for l in leaves]
        self.size = sum(int(np.prod(s)) or 1 for s, _ in self._specs)
        self.pack = jax.jit(self._pack_impl)

    def _pack_impl(self, tree) -> jnp.ndarray:
        parts = [_to_f32_words(leaf) for leaf in jax.tree.leaves(tree)]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    @staticmethod
    @functools.lru_cache(maxsize=16)
    def _stack_fn(k: int):
        return jax.jit(lambda *bufs: jnp.stack(bufs))

    @classmethod
    def stack(cls, bufs) -> jnp.ndarray:
        """Stack K packed buffers device-side (one jitted dispatch per K)."""
        return cls._stack_fn(len(bufs))(*bufs)

    def unpack(self, buf: np.ndarray):
        """Flat f32 host vector -> pytree of numpy arrays (original dtypes)."""
        buf = np.ascontiguousarray(np.asarray(buf, dtype=np.float32))
        out = []
        off = 0
        for shape, dtype in self._specs:
            n = int(np.prod(shape)) if shape else 1
            seg = buf[off:off + n]
            off += n
            if dtype == np.float32:
                a = seg
            elif dtype in (np.dtype(np.int32), np.dtype(np.uint32)):
                a = seg.view(np.int32).astype(dtype, copy=False)
            elif dtype == np.dtype(np.bool_):
                a = seg.view(np.int32).astype(np.bool_)
            elif dtype in (np.dtype(np.uint8), np.dtype(np.int8),
                           np.dtype(np.int16), np.dtype(np.uint16)):
                a = seg.view(np.int32).astype(dtype)
            else:
                raise TypeError(f"HostPacker: unsupported dtype {dtype}")
            out.append(a.reshape(shape))
        return jax.tree.unflatten(self._treedef, out)
