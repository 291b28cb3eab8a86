"""Skeleton joint-order conversions (mano / biomech / halo).

Reference: halo_util/utils.py:17-57.  The repo's "mano" order is
0 = wrist then contiguous 4-joint chains per finger (1-4 thumb, 5-8 index,
9-12 middle, 13-16 ring, 17-20 pinky); "biomech" is level-major
(root, 5x level-1 MCPs ordered thumb..pinky, 5x level-2, 5x level-3,
5x tips).  The permutations below are the same lookup tables.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

HALO_TO_MANO = np.asarray(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
)
MANO_TO_HALO = np.asarray(
    [0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3, 4, 8, 12, 16, 20]
)
MANO_TO_BIOMECH = np.asarray(
    [0, 1, 5, 9, 13, 17, 2, 6, 10, 14, 18, 3, 7, 11, 15, 19, 4, 8, 12, 16, 20]
)
BIOMECH_TO_MANO = np.asarray(
    [0, 1, 6, 11, 16, 2, 7, 12, 17, 3, 8, 13, 18, 4, 9, 14, 19, 5, 10, 15, 20]
)
HALO_TO_BIOMECH = np.asarray(
    [0, 13, 1, 4, 10, 7, 14, 2, 5, 11, 8, 15, 3, 6, 12, 9, 16, 17, 18, 19, 20]
)
BIOMECH_TO_HALO = np.asarray(
    [0, 2, 7, 12, 3, 8, 13, 5, 10, 15, 4, 9, 14, 1, 6, 11, 16, 17, 18, 19, 20]
)

_TABLES = {
    ("halo", "biomech"): HALO_TO_BIOMECH,
    ("biomech", "halo"): BIOMECH_TO_HALO,
    ("mano", "biomech"): MANO_TO_BIOMECH,
    ("biomech", "mano"): BIOMECH_TO_MANO,
    ("halo", "mano"): HALO_TO_MANO,
    ("mano", "halo"): MANO_TO_HALO,
}


def convert_joints(joints: jnp.ndarray, source: str, target: str) -> jnp.ndarray:
    """Permute axis 1 (joints) of a (B, 21, ...) array between orderings.

    Also used on (B, 21, 4, 4) bone-transform stacks, exactly like the
    reference uses it on `trans_mat_pc` (exp_runner.py:186)."""
    if source == target:
        return joints
    perm = _TABLES[(source, target)]
    return joints[:, perm]
