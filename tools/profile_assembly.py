#!/usr/bin/env python
"""Per-family / per-stage timing of the batched blocks assembly at B=32."""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def median_time(fn, *args, reps=5, inner=16):
    def perturb(a, acc):
        first = a[0]
        bumped = jax.tree_util.tree_map(
            lambda x: (x + (0.0 * acc).astype(x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x),
            first)
        return (bumped,) + a[1:]

    @jax.jit
    def chained(*a):
        def body(acc, _):
            out = fn(*perturb(a, acc))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + 0.0 * jnp.sum(leaf.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=inner)
        return acc

    jax.block_until_ready(chained(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*args))
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from beam_slam_tpu.solver import gauss_newton as gn
    from beam_slam_tpu.utils import synthetic

    B = 32
    losses = (None, None, 1.0, 2.0, 2.0)
    build = jax.jit(lambda k: synthetic.build_lvio_window(
        k, n_kf=40, kf_dt=0.25, with_vision=True, n_landmarks=256,
        obs_per_lm=8, n_idp=64)[:2])
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    wins, fams = jax.block_until_ready(jax.jit(jax.vmap(build))(keys))
    names = ["imu_rel", "imu_prior", "rel_pose", "reproj", "idp"]

    # full assembly
    asm = jax.vmap(lambda w, f: gn.assemble_normal_equations_blocks(
        w, f, losses), in_axes=(0, 0))
    t_full = median_time(lambda w: asm(w, fams), wins)
    print(f"full blocks assembly: {1e3*t_full:7.2f} ms", flush=True)

    # per-family: assembly with only that family
    for i, name in enumerate(names):
        sub = (fams[i],)
        sub_losses = (losses[i],)
        asm1 = jax.vmap(lambda w, f: gn.assemble_normal_equations_blocks(
            w, f, sub_losses), in_axes=(0, 0))
        t = median_time(lambda w: asm1(w, (fams[i],)), wins)
        print(f"  only {name:9s}: {1e3*t:7.2f} ms", flush=True)

    # linearize-only per family
    for i, name in enumerate(names):
        def lin(w, f):
            r, J, _, _, lm, J_lm = f.linearize(w)
            s = jnp.sum(r) + jnp.sum(J)
            if J_lm is not None:
                s = s + jnp.sum(J_lm)
            return s
        t = median_time(
            lambda w: jax.vmap(lin, in_axes=(0, 0))(w, fams[i]), wins)
        print(f"  lin  {name:9s}: {1e3*t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
