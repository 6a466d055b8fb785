"""Checkpoint/resume: Orbax-backed sharded state + sampler state + retention.

Reference semantics preserved (`/root/reference/f_lite/checkpoint.py`,
`train.py:1077-1097`):
- step-numbered dirs `{output_dir}/checkpoints/{step}/` holding model+optim
  state and `sampler_state.json` (reference: `dcp_api/{step}/` with
  model/optim/sampler .pt files, `checkpoint.py:20-23,221-231`);
- `latest` = max numeric dirname (`checkpoint.py:26-39`);
- retention pruning to `checkpoints_total_limit`, oldest first
  (`train.py:1084-1097`).

Unlike the reference's gather-to-rank-0 full-state-dict save
(`checkpoint.py:158-219`), Orbax writes each shard from its home device —
no all-gather spike, and restore re-shards directly onto the target mesh
via the abstract-state shardings.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, output_dir: str | Path, total_limit: int | None = None):
        self.root = Path(output_dir).resolve() / "checkpoints"
        self.root.mkdir(parents=True, exist_ok=True)
        self.total_limit = total_limit
        self._ckptr = ocp.StandardCheckpointer()

    # ---- discovery (`checkpoint.py:26-39`) ------------------------------
    def steps(self) -> list[int]:
        """COMMITTED checkpoints only. Orbax materializes `{step}/state`
        by atomic rename at commit, so a dir without it is an in-flight
        async write or a torn crash leftover — `latest` resolution and
        retention must both skip it (resume falls back to the previous
        good step; prune never counts the in-flight newest toward the
        limit, so it cannot evict the last committed checkpoint while a
        `wait=False` write is still running)."""
        out = []
        for d in self.root.iterdir():
            if d.is_dir() and d.name.isdigit() and (d / "state").exists():
                out.append(int(d.name))
        return sorted(out)

    @property
    def last_training_time(self) -> int | None:
        s = self.steps()
        return s[-1] if s else None

    def _dir(self, step: int) -> Path:
        return self.root / str(step)

    # ---- save -----------------------------------------------------------
    def save(
        self,
        step: int,
        state: Any,
        sampler_state: dict | None = None,
        *,
        wait: bool = True,
        extra: dict | None = None,
    ):
        """`extra`: additional named pytrees saved alongside the state
        (e.g. {"ema": ema_params}).

        `wait=False` returns as soon as the state is snapshotted to host
        memory; the directory write continues in the background while
        training proceeds (Orbax async). The next save (or an explicit
        `wait_until_finished`) drains it, so at most one write is ever in
        flight and `prune` can never race an in-flight directory (it only
        removes the oldest dirs; the in-flight one is the newest).

        Write order matters: extras (e.g. ema) go FIRST, the state tree —
        whose directory is the commit marker `steps()` checks — LAST.
        Orbax drains the previous async write at the head of each save,
        so state-first would (a) leave a window where `{step}/state`
        exists but the ema write is torn (a crash there resumes with the
        run-long EMA silently reinitialized) and (b) pay the multi-GB
        state-write latency synchronously inside the next (small) extra
        save, defeating `wait=False`. Extras-first closes both: a torn
        extra leaves no commit marker, and the dominant state write is
        the one left draining in the background."""
        d = self._dir(step)
        # drain any still-running async write before starting a new one
        self._ckptr.wait_until_finished()
        for name, tree in (extra or {}).items():
            self._ckptr.save(d / name, tree, force=True)
        self._ckptr.save(d / "state", state, force=True)
        if wait:
            self._ckptr.wait_until_finished()
        if sampler_state is not None:
            d.mkdir(parents=True, exist_ok=True)
            (d / "sampler_state.json").write_text(
                json.dumps(sampler_state, indent=2)
            )
        self.prune()
        return d

    def wait_until_finished(self):
        """Block until any `wait=False` save has committed its directory,
        then apply retention (the save-time prune skips in-flight dirs)."""
        self._ckptr.wait_until_finished()
        self.prune()

    # ---- load -----------------------------------------------------------
    def load(self, step: int | str, abstract_state: Any) -> Any:
        """`abstract_state`: jax.eval_shape of the state, optionally with
        `.sharding` set on leaves to restore straight onto the mesh."""
        if step == "latest":
            step = self.last_training_time
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.root}")
        return self._ckptr.restore(
            self._dir(int(step)) / "state", abstract_state
        )

    def load_extra(self, step: int | str, name: str, abstract: Any):
        """Restore an `extra` tree saved by `save`; None if absent."""
        if step == "latest":
            step = self.last_training_time
            if step is None:
                return None
        p = self._dir(int(step)) / name
        if not p.exists():
            return None
        return self._ckptr.restore(p, abstract)

    def load_sampler_state(self, step: int | str) -> dict | None:
        if step == "latest":
            step = self.last_training_time
            if step is None:
                return None
        f = self._dir(int(step)) / "sampler_state.json"
        return json.loads(f.read_text()) if f.exists() else None

    # ---- retention (`train.py:1084-1097`) -------------------------------
    def prune(self):
        if self.total_limit is None:
            return
        steps = self.steps()
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            shutil.rmtree(self._dir(victim), ignore_errors=True)


def abstract_like(state, shardings=None):
    """Abstract pytree for `Checkpointer.load`, optionally sharded."""
    shapes = jax.eval_shape(lambda: state)
    if shardings is None:
        return shapes
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )
