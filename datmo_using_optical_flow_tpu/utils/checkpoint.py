"""Checkpoint / resume of streaming pipeline state (SURVEY.md §5.4).

The reference has no resume capability; its entire mutable pipeline state is the
small tuple at ``Optical_flow/main.py:552-559`` (tracks, lifetimes, confirmed set,
previous velocity grids) — here the :class:`StepCarry` / :class:`GmfaCarry`
pytrees.  Snapshots go through orbax when available, with a plain ``.npz``
fallback; both round-trip arbitrary NamedTuple pytrees.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, carry, step: int = 0) -> None:
    """Snapshot a carry pytree to ``path`` (directory for orbax, .npz otherwise)."""
    if path.endswith(".npz"):
        leaves, treedef = jax.tree.flatten(carry)
        np.savez(path, step=step, n=len(leaves),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, f"step_{step}")),
               jax.tree.map(np.asarray, carry), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like, step: int = 0):
    """Restore a carry pytree with the structure/dtypes of ``like``."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves, treedef = jax.tree.flatten(like)
        restored = [np.asarray(data[f"leaf_{i}"]).astype(np.asarray(x).dtype)
                    for i, x in enumerate(leaves)]
        return jax.tree.unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.path.join(path, f"step_{step}")),
                         jax.tree.map(np.asarray, like))
