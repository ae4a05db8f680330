"""Versioned checkpoint manager matching the reference's on-disk contract
(/root/reference/checkpoint.py:9-147):

  <path>/version.txt            — fsync'd current version number
  <path>/configs.json           — config snapshot written on first version
  <path>/model_v{N}.msgpack     — model (+ optimizer + PRNG) state per epoch
  <path>/training_stats.json    — append-only JSON-lines epoch stats

Beyond the reference (which saves model weights only — resume loses
optimizer state), each version also carries the optax state and PRNG key
(SURVEY.md §5 checkpoint/resume). Serialization is flax msgpack instead of
torch.save.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

from flax import serialization


class CheckpointManager:
    def __init__(self, path: str) -> None:
        self.path = Path(path)
        self.version = self.load_version()
        self.old_version = 0
        self.path.mkdir(parents=True, exist_ok=True)
        self.stats: Dict[str, Any] = {}

    # -- file layout -------------------------------------------------- #
    def get_version_file(self) -> Path:
        return self.path / "version.txt"

    def get_config_file(self) -> Path:
        return self.path / "configs.json"

    def get_model_file(self, version: int) -> Path:
        return self.path / f"model_v{version}.msgpack"

    def get_stats_file(self) -> Path:
        return self.path / "training_stats.json"

    # -- config / stats ------------------------------------------------ #
    def save_config(self, config: Dict) -> None:
        self.get_config_file().write_text(json.dumps(config, indent=4))

    def load_config(self) -> str:
        return self.get_config_file().read_text()

    def append_stats(self, stats: Dict) -> None:
        with self.get_stats_file().open("at") as tf:
            tf.write(json.dumps(stats) + "\n")

    def load_stats(self):
        with self.get_stats_file().open("rt") as tf:
            for line in tf:
                yield line

    # -- model state ---------------------------------------------------- #
    def save_model(self, state: Any) -> None:
        """`state` is any pytree (e.g. {'params': ..., 'opt_state': ...,
        'rng': ...}); serialized with flax msgpack."""
        self.get_model_file(self.version).write_bytes(serialization.to_bytes(state))

    def load_model(self, target: Any) -> Any:
        """Restore into `target`'s structure (flax from_bytes contract)."""
        data = self.get_model_file(self.version).read_bytes()
        return serialization.from_bytes(target, data)

    def load_model_raw(self) -> Any:
        """Restore as plain nested dicts without a structure target —
        useful for evaluators that don't know the optimizer state shape."""
        data = self.get_model_file(self.version).read_bytes()
        return serialization.msgpack_restore(data)

    def restore_variables(self, init_variables=None, require: bool = True):
        """Latest checkpoint -> model variables {'params', [batch_stats]},
        leaves promoted to device arrays (numpy_array[tracer] fancy
        indexing fails under jit otherwise). Shared by the evaluator and
        the explanation pipeline so their restore semantics cannot drift.

        require=True matches the reference's loud load
        (explain_graphs.py:42-43): a missing checkpoint raises instead of
        silently producing random-weight 'results'. require=False falls
        back to `init_variables` with a warning (eval before the first
        checkpoint exists)."""
        import warnings

        import jax
        import jax.numpy as jnp

        try:
            restored = self.load_model_raw()
        except FileNotFoundError:
            if require or init_variables is None:
                raise FileNotFoundError(
                    f"no checkpoint under {self.path!r} (version "
                    f"{self.version}); train first or fix checkpoint.path"
                ) from None
            warnings.warn(
                f"no checkpoint under {self.path!r}; using RANDOM initial "
                "weights — metrics from this evaluator are meaningless"
            )
            restored = init_variables
        restored = jax.tree.map(jnp.asarray, restored)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return variables

    # -- versioning ------------------------------------------------------ #
    def save_version(self, version: int) -> None:
        with self.get_version_file().open("wt") as tf:
            tf.write(f"{version}\n")
            tf.flush()
            os.fsync(tf.fileno())

    def load_version(self) -> int:
        try:
            s = self.get_version_file().read_text().strip()
        except FileNotFoundError:
            return 0
        return int(s) if s else 0

    def write_new_version(
        self, config: Dict, state: Any, epoch_stats: Optional[Dict] = None
    ) -> None:
        if self.version == 0:
            self.save_config(config)
        self.old_version = self.version
        self.version = epoch_stats["Epoch"]
        self.save_version(self.version)
        self.save_model(state)
        for k, v in epoch_stats.items():
            if not isinstance(v, int):
                epoch_stats[k] = round(float(v), 5)
        self.append_stats(epoch_stats)

    def remove_old_version(self) -> None:
        try:
            self.get_model_file(self.old_version).unlink()
        except FileNotFoundError:
            pass
