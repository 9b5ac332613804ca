"""Orbax checkpointing with the reference's best-by-IoU policy.

The reference only ever `torch.save(state_dict)`s the best-IoU model and
cannot resume (`/root/reference/train_water_segmentation.py:597-606`,
SURVEY.md §5.4). Here checkpoints carry the FULL train state — params, BN
statistics, Adam moments, plateau-LR state, step — so training resumes
bit-exactly, while still exporting a params-only "best" checkpoint
equivalent to the reference's .pth artifact.
"""

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.best_iou = -1.0

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             force: bool = False):
        """force=True overwrites an existing step — a resumed run that
        crashed between an Orbax save and its sidecar meta write will
        legitimately re-save the same epoch key."""
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics, force=force)

    def maybe_save_best(self, step: int, state: Any, iou: float) -> bool:
        """Keep a 'best' params+stats checkpoint when IoU improves
        (reference policy: strictly-greater, train_water_segmentation.py:595)."""
        if iou > self.best_iou:
            self.best_iou = iou
            best_dir = os.path.join(self.directory, "best")
            ckptr = ocp.StandardCheckpointer()
            payload = {"params": state.params, "batch_stats": state.batch_stats}
            path = os.path.join(best_dir, "model")
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            ckptr.save(path, payload)
            ckptr.wait_until_finished()
            return True
        return False

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_best(self, template: dict):
        path = os.path.join(self.directory, "best", "model")
        if not os.path.exists(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=template)

    def latest_step(self):
        return self._mgr.latest_step()

    def wait(self):
        """Block until async saves are durable (before writing sidecar
        metadata that points at them)."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
