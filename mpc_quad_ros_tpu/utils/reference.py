"""Reference-trajectory chunk extraction as static-shape gathers.

The reference implements this with Python branches over how many samples are
left (`/root/reference/src/utils/utils.py:897-931`): stride-`skip`
downsampling plus repeat-last-row end padding.  On TPU the whole thing is a
single clipped gather — identical semantics, no data-dependent control flow,
so it vmaps over episodes and lives inside `lax.scan`.
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_gather_indices(current_idx, n_samples: int, control_nodes: int, skip: int = 1):
    """Indices of the chunk [current_idx + j*skip for j < control_nodes], clipped
    to the last sample (== repeat-last-row padding of the reference)."""
    j = jnp.arange(control_nodes)
    idx = current_idx + j * skip
    return jnp.clip(idx, 0, n_samples - 1)


def get_reference_chunk(reference_trajectory: jnp.ndarray, current_idx, control_nodes: int, skip: int = 1) -> jnp.ndarray:
    """Extract `control_nodes` reference rows starting at `current_idx`, taking
    every `skip`-th row, padding past the end by repeating the final row.

    reference_trajectory: (T, d) array; current_idx may be a traced scalar.
    Returns (control_nodes, d).

    Equivalent to the reference's three-branch implementation
    (`utils/utils.py:897-931`): when enough samples remain this is the strided
    slice; otherwise samples past the end all clip to the last row, which is
    exactly the reference's repeat-last-position padding.
    """
    idx = reference_gather_indices(current_idx, reference_trajectory.shape[0], control_nodes, skip)
    return jnp.take(reference_trajectory, idx, axis=0)
