"""Optimizer / train-state construction (SURVEY.md C18).

Reference recipe (ref:train_stage*.py, expected): SGD + momentum, poly LR
decay (1 - step/total)^0.9, weight decay, reduced LR on the pretrained
backbone relative to the heads.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict

from cvpr2020_manet_tpu.config import TrainConfig


def poly_schedule(base_lr: float, total_steps: int, power: float):
    def schedule(step):
        frac = jax.numpy.clip(step / total_steps, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power
    return schedule


def _param_labels(params) -> Any:
    """'backbone' for encoder-trunk params, 'heads' for everything else."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = [getattr(p, "key", None) for p in path]
        return "backbone" if "backbone" in keys else "heads"

    labels = {tuple(p): label_of(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: labels[tuple(p)], params)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def sgd(lr_scale: float):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(
                learning_rate=poly_schedule(
                    cfg.base_lr * lr_scale, cfg.total_steps, cfg.poly_power),
                momentum=cfg.momentum),
        )
    return optax.multi_transform(
        {"backbone": sgd(cfg.backbone_lr_scale), "heads": sgd(1.0)},
        _param_labels)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt)

    @classmethod
    def create(cls, params, cfg: TrainConfig) -> "TrainState":
        if isinstance(params, FrozenDict):
            params = params.unfreeze()
        tx = make_optimizer(cfg)
        return cls(step=jax.numpy.zeros((), jax.numpy.int32), params=params,
                   opt_state=tx.init(params), tx=tx)
