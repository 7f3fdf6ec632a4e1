#!/usr/bin/env python
"""Sub-stage timing of the reproj family's batched assembly at B=32."""

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
    from beam_slam_tpu.core import factors as fc
    from beam_slam_tpu.utils import synthetic

    B = 32
    build = jax.jit(lambda k: synthetic.build_lvio_window(
        k, n_kf=40, kf_dt=0.25, with_vision=True, n_landmarks=256,
        obs_per_lm=8, n_idp=64)[:2])
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    wins, fams = jax.block_until_ready(jax.jit(jax.vmap(build))(keys))
    reproj = fams[3]

    # stage A: gathered block states only
    def gather_only(w, f):
        out = 0.0
        for b, k in enumerate(type(f).BLOCKS):
            g = fc._gather_block(w, k, f.slots[:, b])
            out = out + sum(jnp.sum(x) for x in g)
        return out
    t = median_time(lambda w: jax.vmap(gather_only, (0, 0))(w, reproj), wins)
    print(f"gather:            {1e3*t:7.2f} ms", flush=True)

    # stage B: residual + analytic jacobian (no expand, no mask)
    def rj(w, f):
        gathered = tuple(
            fc._gather_block(w, k, f.slots[:, b])
            for b, k in enumerate(type(f).BLOCKS))
        r, J = jax.vmap(f.residual_and_jacobian_used)(gathered, f.params())
        return jnp.sum(r) + jnp.sum(J)
    t = median_time(lambda w: jax.vmap(rj, (0, 0))(w, reproj), wins)
    print(f"gather+analytic:   {1e3*t:7.2f} ms", flush=True)

    # stage C: full linearize (adds expand einsum + masking + col idx)
    def lin(w, f):
        r, J, _, _, _, J_lm = f.linearize(w)
        return jnp.sum(r) + jnp.sum(J) + jnp.sum(J_lm)
    t = median_time(lambda w: jax.vmap(lin, (0, 0))(w, reproj), wins)
    print(f"full linearize:    {1e3*t:7.2f} ms", flush=True)

    # stage D: linearize + Gram P,q
    def gram(w, f):
        r, J, _, _, _, J_lm = f.linearize(w)
        P = jnp.einsum("fri,frj->fij", J, J)
        q = jnp.einsum("fri,fr->fi", J, r)
        return jnp.sum(P) + jnp.sum(q)
    t = median_time(lambda w: jax.vmap(gram, (0, 0))(w, reproj), wins)
    print(f"lin+gram:          {1e3*t:7.2f} ms", flush=True)

    # stage E: landmark system (H_ll, g_l) one-hots
    def lmsys(w, f):
        r, J, _, _, lm_slot, J_lm = f.linearize(w)
        L = w.landmarks.capacity
        oh_lm = jax.nn.one_hot(lm_slot, L, dtype=J.dtype)
        Hll_f = jnp.einsum("fri,frj->fij", J_lm, J_lm)
        H_ll = jnp.einsum("lf,fij->lij", oh_lm.T, Hll_f)
        gl_f = jnp.einsum("fri,fr->fi", J_lm, r)
        return jnp.sum(H_ll) + jnp.sum(gl_f)
    t = median_time(lambda w: jax.vmap(lmsys, (0, 0))(w, reproj), wins)
    print(f"lin+lm system:     {1e3*t:7.2f} ms", flush=True)

    # stage F: the W coupling (3-operand one-hot einsum)
    def wcoup(w, f):
        r, J, _, _, lm_slot, J_lm = f.linearize(w)
        L = w.landmarks.capacity
        K = w.imu.capacity
        oh_lm = jax.nn.one_hot(lm_slot, L, dtype=J.dtype)
        oh_c = jax.nn.one_hot(f.slots[:, 0], K, dtype=J.dtype)
        Cr = jnp.einsum("frd,frc->fdc", J[:, :, :15], J_lm)
        Cg = Cr.reshape(Cr.shape[0], 45)
        Wk = jnp.einsum("xc,xd,xl->cdl", oh_c, Cg, oh_lm)
        return jnp.sum(Wk)
    t = median_time(lambda w: jax.vmap(wcoup, (0, 0))(w, reproj), wins)
    print(f"lin+W coupling:    {1e3*t:7.2f} ms", flush=True)

    # stage G: H region scatter (single-block diag one-hot)
    def hreg(w, f):
        r, J, _, _, _, _ = f.linearize(w)
        K = w.imu.capacity
        P = jnp.einsum("fri,frj->fij", J, J)
        oh = jax.nn.one_hot(f.slots[:, 0], K, dtype=J.dtype)
        contrib = jnp.einsum("fc,fde->cde", oh, P)
        return jnp.sum(contrib)
    t = median_time(lambda w: jax.vmap(hreg, (0, 0))(w, reproj), wins)
    print(f"lin+H diag region: {1e3*t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
