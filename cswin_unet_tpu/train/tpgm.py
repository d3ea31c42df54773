"""TPGM — Trainable Projected Gradient fine-tuning, as a pure-JAX transform.

Re-implements the semantics of the reference's third (actually-used) TPGM
variant (``universal_train.py:391-615``): one trainable scalar constraint per
parameter tensor; the projected weight is

    θ_proj = θ_anchor + α · (θ − θ_anchor),
    α = hardtanh_[0,1]( clamp(c, 1e-2, max_c) / (‖θ − θ_anchor‖ + 1e-8) )

with the permissive per-layer init ``max(3, 2‖θ‖)`` (``max(10, 5‖θ‖)`` for
head layers) and permissive clamp ceilings ``max(8n, 80)`` / ``max(10n,
100)`` (universal_train.py:417-423, 470-476). Norms are whole-tensor l2 or
MARS (sum|·|).

Where the reference mutates parameters in place behind a
``temporary_parameter_replace`` context manager, JAX needs none of that: the
projection is a pure function of (params, anchor, constraints); constraint
optimization is grad-through-projection w.r.t. constraints only, with Adam +
global-norm clip 1.0 (universal_train.py:579-611). The whole constraint step
jit-compiles.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import cross_entropy_loss, dice_loss
from ..utils.checkpoint import SEP, flatten, unflatten

HEAD_MARKERS = ("head", "final", "classifier", "output", "segmentation_head")


def _is_head(name: str) -> bool:
    return any(m in name.lower() for m in HEAD_MARKERS)


def init_constraints(params, exclude: tuple[str, ...] = (), *,
                     variant: str = "v3", anchor=None) -> dict:
    """Per-tensor scalar constraints.

    variant='v3' (default, the one the reference actually uses): permissive
    init max(3, 2‖θ‖) / max(10, 5‖θ‖) for heads (universal_train.py:417-423).
    variant='v1' (reference tpgm.py:72-75): c₀ = ‖θ − θ_anchor‖ / 2 per
    tensor (requires ``anchor``; zero drift initializes at 0).
    """
    flat = flatten(jax.device_get(params))
    flat_a = flatten(jax.device_get(anchor)) if anchor is not None else None
    out = {}
    for name, val in flat.items():
        if name in exclude:
            continue
        if variant == "v1":
            t = val - flat_a[name] if flat_a is not None else val * 0.0
            init = float(np.linalg.norm(np.asarray(t, np.float64))) / 2.0
        else:
            norm = float(np.linalg.norm(np.asarray(val, np.float64)))
            if _is_head(name):
                init = max(10.0, norm * 5.0)
            else:
                init = max(3.0, norm * 2.0)
        out[name] = jnp.asarray(init, jnp.float32)
    return out


def project(params, anchor, constraints: dict, *, norm_mode: str = "l2",
            variant: str = "v3"):
    """θ_anchor + α·(θ − θ_anchor) per tensor. Differentiable in
    ``constraints`` only (params/anchor are stop-gradiented). Returns
    (projected_params, ratios dict).

    variant='v3': permissive clamp ceilings max(8n, 80)/max(10n, 100),
    floor 1e-2 (universal_train.py:470-476); MARS = Σ|t| whole-tensor.
    variant='v1': clamp (1e-8, n_max) per tensor (tpgm.py:82-83); MARS =
    row-wise Σ|t| over dims 1.. keepdims (tpgm.py:67) giving per-row ratios.
    """
    flat_p = flatten(params)
    flat_a = flatten(anchor)
    out = {}
    ratios = {}
    for name, theta in flat_p.items():
        if name not in constraints:
            out[name] = theta
            continue
        theta = jax.lax.stop_gradient(theta)
        theta_a = jax.lax.stop_gradient(flat_a[name]).astype(theta.dtype)
        t = theta - theta_a
        tf = t.astype(jnp.float32)
        if "l2" in norm_mode:
            n = jnp.linalg.norm(tf)
        elif variant == "v1" and tf.ndim > 1:
            n = jnp.sum(jnp.abs(tf), axis=tuple(range(1, tf.ndim)), keepdims=True)
        else:
            n = jnp.sum(jnp.abs(tf))
        if variant == "v1":
            c = jnp.clip(constraints[name], 1e-8, jnp.max(n))
        else:
            max_c = (
                jnp.maximum(jnp.max(n) * 10.0, 100.0)
                if _is_head(name)
                else jnp.maximum(jnp.max(n) * 8.0, 80.0)
            )
            c = jnp.clip(constraints[name], 1e-2, max_c)
        ratio = jnp.clip(c / (n + 1e-8), 0.0, 1.0)
        ratios[name] = jnp.mean(ratio)
        out[name] = theta_a + (ratio * tf).astype(theta.dtype)
    return unflatten(out), ratios


def ratio_stats(ratios: dict) -> tuple[float, float, float]:
    vals = [float(v) for v in ratios.values()]
    if not vals:
        return 0.0, 0.0, 0.0
    return min(vals), max(vals), sum(vals) / len(vals)


class TPGMTrainer:
    """Constraint optimization loop (reference tpgm_trainer,
    universal_train.py:518-615)."""

    def __init__(
        self,
        model,
        params,
        *,
        norm_mode: str = "l2",
        proj_lr: float = 0.01,
        max_iters: int = 200,
        active_classes: int | None = None,
        exclude: tuple[str, ...] = (),
        enabled: bool = True,
        loss_fn: Callable | None = None,
        label_map: Callable | None = None,
        variant: str = "v3",
    ):
        self.enabled = enabled
        self.norm_mode = norm_mode
        self.max_iters = max_iters
        self.variant = variant
        self.anchor = jax.device_get(params)  # frozen deepcopy (ref :546-549)
        self.label_map = label_map
        if not enabled:
            return
        self.constraints = init_constraints(
            params, exclude, variant=variant, anchor=self.anchor
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(proj_lr)
        )
        self.opt_state = self.optimizer.init(self.constraints)

        num_active = active_classes

        if loss_fn is None:
            def loss_fn(logits, labels):
                nc = logits.shape[-1]
                return 0.4 * cross_entropy_loss(logits, labels) + 0.6 * dice_loss(
                    logits, labels, nc
                )

        def step(constraints, opt_state, params, anchor, image, label):
            def objective(c):
                proj, ratios = project(
                    params, anchor, c, norm_mode=norm_mode, variant=variant
                )
                logits = model.apply(proj, image, deterministic=True)
                if num_active is not None:
                    logits = logits[..., :num_active]
                return loss_fn(logits, label), ratios

            (loss, ratios), grads = jax.value_and_grad(objective, has_aux=True)(
                constraints
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, constraints)
            constraints = optax.apply_updates(constraints, updates)
            return constraints, opt_state, loss, ratios

        self._step = jax.jit(step)

    def optimize(self, params, data_iter, log=print, ratio_logger=None):
        """N constraint-optimization steps over the TPGM loader
        (apply=False path, reference :579-611). ``ratio_logger`` receives
        per-round ratio stats (the dedicated tpgm_ratios.log of the
        reference, universal_train.py:556-567)."""
        if not self.enabled:
            log("TPGM is disabled - skipping")
            return
        initial = {k: float(v) for k, v in jax.device_get(self.constraints).items()}
        count = 0
        loss = ratios = None
        while count < self.max_iters:
            batch = next(data_iter)
            label = batch["label"]
            if self.label_map is not None:
                label = self.label_map(label)
            self.constraints, self.opt_state, loss, ratios = self._step(
                self.constraints, self.opt_state, params, self.anchor,
                batch["image"], label,
            )
            count += 1
            if (count + 1) % 50 == 0:
                mn, mx, mean = ratio_stats(jax.device_get(ratios))
                log(
                    f"TPGM {count}/{self.max_iters} - Loss: {float(loss):.4f}, "
                    f"Mean ratio: {mean:.4f}"
                )
                if ratio_logger is not None:
                    ratio_logger.info(
                        f"iter {count}: loss {float(loss):.6f} ratio "
                        f"min/mean/max {mn:.4f}/{mean:.4f}/{mx:.4f}"
                    )
        final = {k: float(v) for k, v in jax.device_get(self.constraints).items()}
        change = (
            sum(abs(final[k] - initial[k]) for k in final) / max(1, len(final))
        )
        log(f"TPGM optimization complete. Average constraint change: {change:.6f}")
        if ratio_logger is not None and ratios is not None:
            for name, r in sorted(jax.device_get(ratios).items()):
                ratio_logger.info(f"ratio {name}: {float(r):.6f}")
        return ratios

    def apply(self, params):
        """Final projection written into the weights (apply=True path)."""
        if not self.enabled:
            return params
        proj, _ = project(
            jax.device_get(params), self.anchor, jax.device_get(self.constraints),
            norm_mode=self.norm_mode, variant=self.variant,
        )
        return proj
