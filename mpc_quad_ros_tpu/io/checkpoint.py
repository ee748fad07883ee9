"""Checkpoint / resume of closed-loop state.

The reference can only serialize GP/RGP models — and its RGP save drops the
posterior covariance C_g, so a reloaded model restarts with prior uncertainty
(`RGP.py:507-534`, SURVEY §5.4), and there is no mid-trajectory resume at all.
Here the ENTIRE episode carry (plant state, solver warm start, full RGP
posterior incl. C_g, previous prediction) is a pytree, so checkpointing is
just serializing leaves, and `run_episode(..., carry0=...)` resumes
mid-trajectory bit-exactly.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import jax


def save_checkpoint(path: str, pytree: Any) -> str:
    """Serialize any pytree of arrays (device or host) to a pickle of numpy
    leaves + treedef."""
    leaves, treedef = jax.tree.flatten(pytree)
    payload = {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": treedef,
    }
    if not path.endswith(".ckpt"):
        path = path + ".ckpt"
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_checkpoint(path: str, dtype=None) -> Any:
    import jax.numpy as jnp

    if not path.endswith(".ckpt"):
        path = path + ".ckpt"
    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves = [
        jnp.asarray(l, dtype=dtype) if np.issubdtype(np.asarray(l).dtype, np.floating) and dtype
        else jnp.asarray(l)
        for l in payload["leaves"]
    ]
    return jax.tree.unflatten(payload["treedef"], leaves)
