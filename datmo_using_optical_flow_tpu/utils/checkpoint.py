"""Checkpoint / resume of streaming pipeline state (SURVEY.md §5.4).

The reference has no resume capability; its entire mutable pipeline state is the
small tuple at ``Optical_flow/main.py:552-559`` (tracks, lifetimes, confirmed set,
previous velocity grids) — here the :class:`StepCarry` / :class:`GmfaCarry`
pytrees.  Snapshots go through orbax when available, with a plain ``.npz``
fallback; both round-trip arbitrary NamedTuple pytrees.

.npz layout: one entry per leaf, keyed by the leaf's tree path (e.g.
``leaf.table.alive``) so carries can gain fields without invalidating old
snapshots — a missing leaf restores from the ``like`` template (every added
field so far has a functionally-valid default, e.g. ``GmfaCarry.prev_order``'s
arange).  Archives from before the path-keyed format (positional ``leaf_<i>``)
load via an index fallback, which is safe because new fields are only ever
appended.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _path_key(path) -> str:
    return "leaf" + jax.tree_util.keystr(path)


def save_checkpoint(path: str, carry, step: int = 0) -> None:
    """Snapshot a carry pytree to ``path`` (directory for orbax, .npz otherwise)."""
    if path.endswith(".npz"):
        leaves, _ = jax.tree_util.tree_flatten_with_path(carry)
        np.savez(path, step=step, n=len(leaves),
                 **{_path_key(p): np.asarray(x) for p, x in leaves})
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, f"step_{step}")),
               jax.tree.map(np.asarray, carry), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like, step: int = 0):
    """Restore a carry pytree with the structure/dtypes of ``like``.

    Leaves absent from the archive (snapshot predates a carry field) keep the
    ``like`` template's value."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
        restored = []
        for i, (p, x) in enumerate(leaves):
            key = _path_key(p)
            if key in data:
                val = data[key]
            elif (f"leaf_{i}" in data
                  and data[f"leaf_{i}"].shape == np.shape(x)):
                # positional legacy archives: adopt leaf_{i} only when its
                # shape matches the template leaf — a field inserted anywhere
                # but the end of the carry would shift every later index, and
                # silent dtype casting would otherwise mask the mis-assignment
                val = data[f"leaf_{i}"]
            else:
                val = np.asarray(x)     # field added after the snapshot
            restored.append(np.asarray(val).astype(np.asarray(x).dtype))
        return jax.tree.unflatten(treedef, restored)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.path.join(path, f"step_{step}")),
                         jax.tree.map(np.asarray, like))
