"""Training — real, jitted, shardable (the reference stubs this entirely:
``init_gradient`` is commented out and ``launch_gradient`` returns zeros,
src/netFPGA.cpp:518-580).

Two levels:
  * :func:`make_vit_train_step` — optax-based ViT classification step
    (softmax cross-entropy, grad, update), jitted over a ("dp", "tp") mesh
    with batch sharded over dp and Megatron-style tp params; XLA inserts
    the gradient all-reduce and activation collectives.
  * :class:`Trainer` — minimal loop around it (host data feed, metrics).

bf16 compute with f32 params and f32 optimizer state; optional remat via
``ViTConfig.remat`` trades FLOPs for HBM on deep models.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import vit
from ..parallel.mesh import Mesh
from ..parallel.sharding import (batch_sharding, replicated,
                                 vit_param_sharding)

Params = Dict[str, Any]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean NLL over VALID labels; negative labels (the data pipeline's
    partial-batch padding sentinel, runtime/data.py) contribute zero loss
    — without the mask, take_along_axis would wrap -1 to the last class
    and actively train on padded rows."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / n


def vit_loss(params: Params, images: jax.Array, labels: jax.Array,
             cfg: vit.ViTConfig) -> Tuple[jax.Array, jax.Array]:
    logits = vit.forward(params, images, cfg)
    loss = cross_entropy(logits, labels)
    valid = labels >= 0
    correct = jnp.where(valid, logits.argmax(-1) == labels, False)
    acc = correct.sum() / jnp.maximum(valid.sum(), 1)
    return loss, acc


def make_vit_train_step(cfg: vit.ViTConfig, optimizer: optax.GradientTransformation,
                        mesh: Optional[Mesh] = None,
                        donate: bool = True,
                        sequence_parallel: bool = False) -> Callable:
    """Build ``step(params, opt_state, images, labels) ->
    (params, opt_state, metrics)``, jitted (and mesh-sharded if given).

    The fused Pallas kernels carry custom VJPs (Pallas forward,
    XLA-recompute backward), so training uses whatever implementations
    the config selects — fused forwards on TPU, XLA everywhere else.
    """
    import dataclasses
    # Training always uses the exact max-subtract softmax: logits evolve
    # during training, and the backward is exact max-subtract — the
    # max-free clip window can't be statically guaranteed, and forward
    # and gradient must describe the same function (ADVICE r2).
    cfg = dataclasses.replace(cfg, safe_softmax=True)

    if mesh is not None:
        # This builder is the XLA-SPMD-partitioner path: the whole graph
        # uses the XLA block implementations and the partitioner splits
        # them per the PartitionSpecs (Pallas custom calls are opaque to
        # it).  The FUSED multi-chip path — mega-kernels per shard under
        # shard_map, Megatron tp with one psum per half — is
        # parallel/shard_model.make_sharded_train_step; Trainer selects
        # it by default when a mesh is given.  This path remains for
        # sequence-parallel activation sharding and as the collective-
        # layout oracle the fused path is parity-tested against.
        cfg = dataclasses.replace(cfg, attn_impl="xla", mlp_impl="xla")
    if sequence_parallel and mesh is not None:
        import dataclasses
        from ..parallel.sharding import sequence_parallel_sharding
        cfg = dataclasses.replace(
            cfg, activation_sharding=sequence_parallel_sharding(mesh))

    def step(params, opt_state, images, labels):
        (loss, acc), grads = jax.value_and_grad(
            partial(vit_loss, cfg=cfg), has_aux=True)(params, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    pshard = vit_param_sharding(mesh)
    oshard = replicated(mesh)   # optax state: let SPMD propagate from params
    ishard = batch_sharding(mesh, 4)
    lshard = batch_sharding(mesh, 1)
    mshard = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(pshard, None, ishard, lshard),
        out_shardings=(pshard, None, {"loss": mshard, "accuracy": mshard}),
        donate_argnums=(0, 1) if donate else (),
    )


def init_train_state(key: jax.Array, cfg: vit.ViTConfig,
                     optimizer: optax.GradientTransformation,
                     mesh: Optional[Mesh] = None):
    """Init params (+ place on mesh) and optimizer state."""
    params = vit.init_params(key, cfg)
    if mesh is not None:
        params = jax.device_put(params, vit_param_sharding(mesh))
    opt_state = optimizer.init(params)
    return params, opt_state


class Trainer:
    """Minimal training loop for ViT classification.

    With a mesh, ``impl="auto"`` selects the FUSED multi-chip step
    (parallel/shard_model.py: mega-kernels per shard under shard_map,
    Megatron tp) and keeps the parameters in the tp layout;
    ``impl="xla_spmd"`` keeps the XLA-partitioner path.  Use
    :meth:`canonical_params` for checkpointing either way."""

    def __init__(self, cfg: vit.ViTConfig, learning_rate: float = 3e-4,
                 weight_decay: float = 0.05, mesh: Optional[Mesh] = None,
                 seed: int = 0, impl: str = "auto"):
        self.cfg = cfg
        self.mesh = mesh
        self.optimizer = optax.adamw(learning_rate,
                                     weight_decay=weight_decay)
        self._fused = mesh is not None and impl != "xla_spmd"
        if self._fused:
            from ..parallel import shard_model as sm
            kernel_impl = "auto" if impl == "auto" else impl
            self.params, self.opt_state = sm.init_sharded_train_state(
                jax.random.key(seed), cfg, self.optimizer, mesh)
            self._step = sm.make_sharded_train_step(
                cfg, self.optimizer, mesh, impl=kernel_impl)
        else:
            self.params, self.opt_state = init_train_state(
                jax.random.key(seed), cfg, self.optimizer, mesh)
            self._step = make_vit_train_step(cfg, self.optimizer, mesh)
        self.history = []

    def canonical_params(self) -> Params:
        """Parameters in the models/vit.py layout (for checkpoint IO)."""
        if self._fused:
            from ..parallel.shard_model import from_tp_layout
            return from_tp_layout(self.params)
        return self.params

    def fit(self, batches: Iterable[Tuple[jax.Array, jax.Array]],
            log_every: int = 0):
        for i, (images, labels) in enumerate(batches):
            if self.mesh is not None:
                images = jax.device_put(
                    images, batch_sharding(self.mesh, 4))
                labels = jax.device_put(
                    labels, batch_sharding(self.mesh, 1))
            self.params, self.opt_state, metrics = self._step(
                self.params, self.opt_state, images, labels)
            self.history.append(
                {k: float(v) for k, v in metrics.items()})
            if log_every and i % log_every == 0:
                m = self.history[-1]
                print(f"step {i}: loss {m['loss']:.4f} "
                      f"acc {m['accuracy']:.3f}")
        return self.history
