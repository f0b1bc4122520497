"""Offline pretraining of MidasSmall on procedural scenes.

Loss = MiDaS-style scale-and-shift-invariant MSE on inverse depth + a
multi-scale gradient-matching term (sharp depth edges at occlusions).

    python -m stereovision_tpu.models.train_synthetic --steps 2000 \
        --out stereovision_tpu/models/pretrained/midas_synthetic.msgpack
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def ssi_align(pred, target):
    """Per-image least-squares scale+shift of pred onto target."""
    import jax.numpy as jnp

    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    pm = p.mean(axis=1, keepdims=True)
    tm = t.mean(axis=1, keepdims=True)
    cov = ((p - pm) * (t - tm)).mean(axis=1, keepdims=True)
    var = ((p - pm) ** 2).mean(axis=1, keepdims=True) + 1e-8
    s = cov / var
    return (p - pm) * s + tm, t


def sign_penalty(pred, target):
    """Mean negative-correlation penalty. The unconstrained SSI scale lets
    the net satisfy the loss with per-image INVERTED orderings (measured:
    Spearman −0.95 on ground-plane scenes after widening the distribution);
    a HARD positive-scale clamp instead kills the gradient wherever the
    correlation is already negative (measured: val loss frozen). This soft
    penalty pushes negatively-correlated images toward positive correlation
    and vanishes once they get there."""
    import jax
    import jax.numpy as jnp

    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    pm = p.mean(axis=1, keepdims=True)
    tm = t.mean(axis=1, keepdims=True)
    cov = ((p - pm) * (t - tm)).mean(axis=1)
    var_p = ((p - pm) ** 2).mean(axis=1)
    var_t = ((t - tm) ** 2).mean(axis=1)
    corr = cov / jnp.sqrt(var_p * var_t + 1e-10)
    return jnp.mean(jax.nn.relu(-corr))


def loss_fn(model, params, imgs, invd):
    import jax.numpy as jnp

    pred = model.apply(params, imgs / 255.0)
    pa, t = ssi_align(pred, invd)
    mse = jnp.mean((pa - t) ** 2)
    mse = mse + 0.02 * sign_penalty(pred, invd)
    # gradient matching at 2 scales
    pr = pa.reshape(invd.shape)
    tr = t.reshape(invd.shape)
    g = 0.0
    for k in (1, 2):
        gx = jnp.abs(jnp.diff(pr[:, :, ::k], axis=2) - jnp.diff(tr[:, :, ::k], axis=2)).mean()
        gy = jnp.abs(jnp.diff(pr[:, ::k, :], axis=1) - jnp.diff(tr[:, ::k, :], axis=1)).mean()
        g = g + gx + gy
    return mse + 0.3 * g


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="stereovision_tpu/models/pretrained/midas_synthetic.msgpack")
    args = ap.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from stereovision_tpu.models.checkpoint import save_variables
    from stereovision_tpu.models.midas import MidasSmall
    from stereovision_tpu.models.synthetic_scenes import batch as make_batch

    model = MidasSmall()
    rng = np.random.default_rng(args.seed)
    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, args.size, args.size, 3))
    )
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def step(variables, opt_state, imgs, invd):
        l, grads = jax.value_and_grad(
            lambda v: loss_fn(model, v, imgs, invd)
        )(variables)
        updates, opt_state = tx.update(grads, opt_state)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, l

    val_imgs, val_invd = make_batch(np.random.default_rng(10_000), 32, args.size)
    val_imgs = jnp.asarray(val_imgs)
    val_invd = jnp.asarray(val_invd)

    @jax.jit
    def val_loss(variables):
        return loss_fn(model, variables, val_imgs, val_invd)

    print(f"initial val loss: {float(val_loss(variables)):.5f}")
    t0 = time.time()
    for it in range(args.steps):
        imgs, invd = make_batch(rng, args.batch, args.size)
        variables, opt_state, l = step(
            variables, opt_state, jnp.asarray(imgs), jnp.asarray(invd)
        )
        if (it + 1) % 100 == 0:
            print(
                f"step {it+1}/{args.steps}  train {float(l):.5f}  "
                f"val {float(val_loss(variables)):.5f}  "
                f"({(time.time()-t0)/(it+1)*1000:.0f} ms/step)"
            )
    path = save_variables(args.out, variables)
    print(f"saved → {path}  final val {float(val_loss(variables)):.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
