"""Checkpoint / resume.

SURVEY.md §5: the reference's restart payload is the env state dict
(sapien_env.py:1153-1199) plus ad-hoc torch checkpoints for training. Here
the whole ``EnvState`` pytree (sim + controller + RNG + task extras) IS the
checkpoint; planner and training states are pytrees too. This module saves /
restores any such pytree with orbax (or a numpy fallback), giving
solver-state recovery for multi-host runs: re-launch and ``restore``.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


# magic prefix of the zero-size-leaf sentinel; the payload after it is a
# JSON {"shape": [...], "dtype": "..."} so TARGETLESS restores can rebuild
# the original empty array exactly (not just restores-with-template)
_EMPTY_MAGIC = np.frombuffer(b"MST0EMPTY:", np.uint8)


def _encode_empty(arr: np.ndarray) -> np.ndarray:
    import json

    desc = json.dumps(
        {"shape": list(arr.shape), "dtype": str(arr.dtype)}
    ).encode()
    return np.concatenate([_EMPTY_MAGIC, np.frombuffer(desc, np.uint8)])


def _maybe_decode_empty(saved):
    """If ``saved`` is a zero-size sentinel, return the reconstructed empty
    array; else None."""
    import json

    s = np.asarray(saved)
    n = _EMPTY_MAGIC.size
    if (
        s.dtype == np.uint8
        and s.ndim == 1
        and s.size > n
        and np.array_equal(s[:n], _EMPTY_MAGIC)
    ):
        meta = json.loads(bytes(s[n:]).decode())
        return np.zeros(tuple(meta["shape"]), np.dtype(meta["dtype"]))
    return None


def _to_numpy(x):
    """Typed PRNG keys serialize via their raw key data.

    Zero-size leaves (e.g. ``sim.hull_verts`` in a scene with no hulls)
    carry no data but orbax refuses to serialize them — store a tagged
    sentinel encoding the original shape/dtype; both targeted and
    targetless restores reconstruct the empty array from it."""
    if _is_key(x):
        return np.asarray(jax.random.key_data(x))
    arr = np.asarray(x)
    if arr.size == 0:
        return _encode_empty(arr)
    return arr


def _from_numpy(saved, like):
    if _is_key(like):
        return jax.random.wrap_key_data(jax.numpy.asarray(saved))
    like_arr = np.asarray(like) if not hasattr(like, "shape") else like
    if getattr(like_arr, "size", None) == 0:
        return like  # zero-size leaf: no data, template is exact
    return saved


def _decode_targetless(saved_tree):
    def dec(x):
        empty = _maybe_decode_empty(x)
        return x if empty is None else empty

    return jax.tree.map(dec, saved_tree)


def save(path: str, tree: Any):
    """Save a pytree checkpoint (orbax when available)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.tree.map(_to_numpy, tree), force=True)
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.tree.map(_to_numpy, tree), f)


def restore(path: str, target: Any = None) -> Any:
    """Restore a pytree checkpoint. ``target`` (an example pytree) restores
    exact structure/dtypes when given."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        if target is not None:
            saved = ckpt.restore(path, item=jax.tree.map(_to_numpy, target))
            return jax.tree.map(_from_numpy, saved, target)
        return _decode_targetless(ckpt.restore(path))
    with open(path + ".pkl", "rb") as f:
        saved = pickle.load(f)
    if target is not None:
        return jax.tree.map(_from_numpy, saved, target)
    return _decode_targetless(saved)


def save_env(path: str, env):
    """Checkpoint a live env's complete state (the restart payload)."""
    save(path, env._state)


def restore_env(path: str, env):
    restored = restore(path, target=env._state)
    env._state = jax.tree.map(
        lambda x: x if _is_key(x) else jax.numpy.asarray(x), restored
    )
    return env
