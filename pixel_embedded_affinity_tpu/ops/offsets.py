"""Offset geometry for multi-offset affinities.

Semantics match the reference framework (see
/root/reference/scripts_cvppp/utils/affinity_ours.py:4-15 and
/root/reference/scripts_ac3ac4/loss/loss_embedding_mse.py:176):

* 2D: for each shift s, neighbor=4 contributes offsets [-s,0], [0,-s]
  (vertical then horizontal); neighbor=8 additionally [-s,-s], [-s,s].
* 3D: a fixed 12-channel shift table [1,1,1, 2,3,3, 3,9,9, 4,27,27] where
  channel i shifts along axis i % 3 of (z, y, x), in the negative direction.

An offset vector ``o`` means: channel value at voxel ``p`` is the affinity
between ``p`` and ``p + o``.
"""

from __future__ import annotations


def gen_offsets(shift: int, neighbor: int = 4) -> list[list[int]]:
    """Offsets for a single shift magnitude. neighbor in {4, 8}."""
    assert neighbor in (4, 8), "neighbor must be 4 or 8"
    if neighbor == 4:
        return [[-shift, 0], [0, -shift]]
    return [[-shift, 0], [0, -shift], [-shift, -shift], [-shift, shift]]


def multi_offset(shifts: list[int], neighbor: int = 4) -> list[list[int]]:
    """Concatenate offsets over shift magnitudes (e.g. [1,3,5,9,27] -> 10 offsets)."""
    out: list[list[int]] = []
    for s in shifts:
        out += gen_offsets(s, neighbor=neighbor)
    return out


#: Fixed 3D shift table: channel i uses axis i % 3 of (z, y, x).
SHIFTS_3D: tuple[int, ...] = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)


def offsets_3d(shifts: tuple[int, ...] = SHIFTS_3D) -> list[list[int]]:
    """Expand the interleaved 3D shift table into explicit (dz,dy,dx) offsets."""
    out = []
    for i, s in enumerate(shifts):
        off = [0, 0, 0]
        off[i % 3] = -s
        out.append(off)
    return out
