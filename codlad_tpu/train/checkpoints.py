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

        Multi-host: EVERY process must call this (orbax synchronizes
        internally and only the primary host writes — gating the call on
        the main process would deadlock the primary at orbax's barrier).
        The directory must be shared/consistent across hosts, and save
        decisions must be based on replicated values so all hosts call in
        lockstep (cli/train_latent.py does both)."""
        to_np = lambda t: jax.tree.map(np.asarray, t)
        self._ckpt.save(self._path(name, "main"), to_np(self._main_tree(state)),
                        force=True)
        if jax.tree.leaves(state.opt_state):  # identity optimizers are empty
            self._ckpt.save(self._path(name, "opt"), to_np(state.opt_state),
                            force=True)
        self._ckpt.wait_until_finished()

    def restore(self, template, name, load_opt=None):
        """Restore into the structure of `template` (a TrainState).

        load_opt: None = try and fall back; True/False force.
        """
        to_np = lambda t: jax.tree.map(np.asarray, t)
        main = self._ckpt.restore(self._path(name, "main"),
                                  target=to_np(self._main_tree(template)))
        state = template.replace(
            step=main["step"], params=main["params"],
            ema_params=main.get("ema_params", template.ema_params),
            vq_state=main.get("vq_state", template.vq_state))
        if load_opt is not False:
            try:
                opt = self._ckpt.restore(self._path(name, "opt"),
                                         target=to_np(template.opt_state))
                state = state.replace(opt_state=opt)
            except Exception:
                if load_opt is True:
                    raise
        return state

    def exists(self, name):
        return os.path.isdir(self._path(name, "main"))

    def available_steps(self):
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("step_") and os.path.isdir(self._path(d, "main")):
                out.append(int(d.split("_")[1]))
        return sorted(out)
