"""Full-state checkpointing (Orbax).

The reference saves model weights only (``torch.save(agent.state_dict())``
every 100 episodes, sim2real/train.py:587-589) — a fresh context cannot
resume a run exactly (no optimizer state, no RNG, no env state; SURVEY §5).
This module checkpoints the *entire* train state pytree — params, optimizer
state, batched env states, PRNG keys, counters — so training resumes
bit-exactly, plus keeps the reference's deployable-gait JSON export as a
side artifact.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in (self._mgr.all_steps() or []):
            # final forced save may coincide with a periodic one (e.g.
            # total_chunks % save_interval == 0) — already durable, skip
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()
        return saved

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
