"""Checkpoint/resume via orbax.

The reference only saves best weights at the end of training
(run_transformer_gengcn_cv.py:401-404,429-432) or per-epoch with manual
pruning (LPE/main_ZINC_graph_regression.py:184-195) and has NO resume path.
Here: full TrainState (params + opt_state + step + batch_stats) checkpoints
with a keep-latest policy and true resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from feta_tmlr_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2,
                 async_save: bool = False):
        """async_save=True overlaps checkpoint IO with the next epoch's
        training (orbax async machinery: device arrays are snapshotted
        synchronously, serialization/write happens on a background
        thread). `wait_until_finished`/`close` block on in-flight saves,
        so a crash-free run never loses a completed `save` call."""
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save),
        )

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if not self._async:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.close()
