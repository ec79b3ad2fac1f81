"""Checkpoint save/restore via orbax.

Replaces mmengine's CheckpointHook + `load_from`/`--resume` machinery
(reference config:706,724-725; tools/train.py:29-35,113-119): periodic
checkpoints with keep-last-k retention, resume-latest, and prefix-restricted
restore for backbone initialisation from an external (converted) checkpoint.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 16):
        self._mngr = ocp.CheckpointManager(
            _abs(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def latest_step(self):
        return self._mngr.latest_step()

    def restore(self, state_template: Any, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mngr.close()


def save_params(path: str, tree: Any):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), tree)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(path), template)


def merge_by_prefix(params: Any, donor: Any, prefix: str):
    """Overwrite the `prefix` subtree of `params` with matching leaves of
    `donor` (e.g. prefix='backbone' for OneFormer3D-style backbone init,
    reference config:706 `load_from`). Leaves missing from the donor keep
    their current value (partial load, mirroring torch strict=False)."""

    def select(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            p = f"{path}/{k}" if path else k
            sub = src.get(k) if isinstance(src, dict) else None
            if isinstance(v, dict):
                out[k] = select(v, sub if isinstance(sub, dict) else {}, p)
            else:
                use = sub is not None and (p.startswith(prefix) or prefix == "")
                out[k] = sub if use else v
        return out

    merged = select(params, donor)
    jax.tree_util.tree_structure(merged)  # sanity: still a valid tree
    return merged
