"""Checkpoint / resume — a capability the reference entirely lacks.

The reference persists nothing but an append-only text log (reference
main.py:100-103); a crashed 800-epoch collab run loses everything.  Here:
orbax-backed checkpoints of (params, opt_state, logger results, epoch/run
counters), sharding-aware (orbax restores NamedSharding layouts when a mesh
is active), with a small retention policy.

Layout: <dir>/step_<n>/ managed by orbax.checkpoint.CheckpointManager.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for the training state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        """extra: JSON-serializable metadata (run, epoch, logger results...)."""
        ocp = self._ocp
        payload = {
            "params": params,
            "opt_state": opt_state,
        }
        args = {
            "state": ocp.args.StandardSave(payload),
        }
        if extra is not None:
            args["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Returns (params, opt_state, extra_dict_or_None).

        ``template`` is a {params, opt_state} pytree of like-shaped arrays
        (e.g. freshly initialized state) used to restore matching
        shardings/dtypes.
        """
        ocp = self._ocp
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    np.shape(x),
                    x.dtype,
                    sharding=getattr(x, "sharding", None),
                ),
                {"params": template["params"], "opt_state": template["opt_state"]},
            )
            restore_args = ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                extra=ocp.args.JsonRestore(),
            )
        else:
            restore_args = ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                extra=ocp.args.JsonRestore(),
            )
        try:
            out = self._mgr.restore(step, args=restore_args)
        except (FileNotFoundError, KeyError, ValueError):
            # checkpoint without the optional 'extra' item
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore()
                    if template is None
                    else ocp.args.StandardRestore(abstract)
                ),
            )
        state = out["state"]
        extra = out.get("extra") if hasattr(out, "get") else None
        return state["params"], state["opt_state"], extra
