"""Checkpointing: best/last/step-N semantics over a single TrainState.

Replaces the reference's per-epoch torch file zoo (reference:
train_vqvae.py:303-320, train_latent.py:282-294, 381-408) with orbax
checkpoints plus a JSON of the run config next to them (reference
`modelparams.json`, train_vqvae.py:46-47).  Saves are atomic (orbax writes
to a tmp dir and renames — the equivalent of the reference's `safe_save`,
train_latent.py:29-33).

Each named checkpoint is stored as two orbax trees: `main` (step, params,
ema_params, vq_state) and `opt` (optimizer state), so inference can restore
weights under a different/absent optimizer (the reference similarly loads
net/ema weights without optimizer state at test time, test.py:264-286).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, *parts):
        return os.path.join(self.directory, *parts)

    def save_config(self, config: dict):
        with open(self._path("modelparams.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def load_config(self):
        with open(self._path("modelparams.json")) as f:
            return json.load(f)

    @staticmethod
    def _main_tree(state):
        tree = {"step": state.step, "params": state.params}
        if state.ema_params is not None:
            tree["ema_params"] = state.ema_params
        if state.vq_state is not None:
            tree["vq_state"] = state.vq_state
        return tree

    def save(self, state, name):
        """name: 'last', 'best', or f'step_{n}'.

        Crash-safe: the new checkpoint is written to `<name>.new` and only
        swapped into `<name>` once BOTH trees are finalized, so a kill at
        any instant leaves either the old or the new checkpoint recoverable
        (_resolve). Saving with force=True straight onto `<name>` deletes
        the previous checkpoint before the replacement lands — a mid-save
        SIGKILL once destroyed `last` entirely and a `-resume` run silently
        started from scratch.

        Multi-host: EVERY process must call this (orbax synchronizes
        internally and only the primary host writes — gating the call on
        the main process would deadlock the primary at orbax's barrier).
        The directory must be shared/consistent across hosts, and save
        decisions must be based on replicated values so all hosts call in
        lockstep (cli/train_latent.py does both)."""
        import shutil

        to_np = lambda t: jax.tree.map(np.asarray, t)
        new = self._path(name + ".new")
        if jax.process_index() == 0 and os.path.isdir(new):
            shutil.rmtree(new)
        self._ckpt.save(os.path.join(new, "main"),
                        to_np(self._main_tree(state)), force=True)
        if jax.tree.leaves(state.opt_state):  # identity optimizers are empty
            self._ckpt.save(os.path.join(new, "opt"), to_np(state.opt_state),
                            force=True)
        self._ckpt.wait_until_finished()
        if jax.process_index() == 0:
            cur, old = self._path(name), self._path(name + ".old")
            if os.path.isdir(old):
                shutil.rmtree(old)
            if os.path.isdir(cur):
                os.rename(cur, old)
            os.rename(new, cur)
            if os.path.isdir(old):
                shutil.rmtree(old)

    def restore(self, template, name, load_opt=None):
        """Restore into the structure of `template` (a TrainState).

        load_opt: None = try and fall back; True/False force.
        """
        base = self._resolve(name)
        if base is None:
            raise FileNotFoundError(
                f"no finalized checkpoint '{name}' under {self.directory}")
        to_np = lambda t: jax.tree.map(np.asarray, t)
        main = self._ckpt.restore(os.path.join(base, "main"),
                                  target=to_np(self._main_tree(template)))
        state = template.replace(
            step=main["step"], params=main["params"],
            ema_params=main.get("ema_params", template.ema_params),
            vq_state=main.get("vq_state", template.vq_state))
        if load_opt is not False:
            try:
                opt = self._ckpt.restore(os.path.join(base, "opt"),
                                         target=to_np(template.opt_state))
                state = state.replace(opt_state=opt)
            except Exception:
                if load_opt is True:
                    raise
        return state

    def _resolve(self, name):
        """Directory holding a finalized `name`, preferring the live copy
        but recovering from a save/swap interrupted at any point: `.new`
        (finalized but not yet swapped in) or `.old` (swap started, crash
        before the new copy was moved into place)."""
        for cand in (self._path(name), self._path(name + ".new"),
                     self._path(name + ".old")):
            if os.path.isdir(os.path.join(cand, "main")):
                return cand
        return None

    def exists(self, name):
        return self._resolve(name) is not None

    def available_steps(self):
        return self.available_snapshots("step")

    def available_snapshots(self, prefix):
        """Sorted N for finalized '<prefix>_N' checkpoints (recovered
        `.new`/`.old` copies included)."""
        out = set()
        for d in os.listdir(self.directory):
            if not d.startswith(prefix + "_"):
                continue
            n = d.split("_", 1)[1].split(".", 1)[0]
            if n.isdigit() and self.exists(f"{prefix}_{n}"):
                out.add(int(n))
        return sorted(out)

    def best_resume_name(self, snapshot_prefix):
        """Checkpoint name a `-resume` run should restore: 'last' if usable,
        else the newest '<snapshot_prefix>_N', else 'best', else None.
        Exists so a corrupted/unfinalized `last` degrades a resume by one
        save interval instead of silently restarting the run from scratch."""
        names = ["last"] + [f"{snapshot_prefix}_{n}" for n in
                            reversed(self.available_snapshots(snapshot_prefix))
                            ] + ["best"]
        return next((n for n in names if self.exists(n)), None)
