"""int8-ACTIVATION serving probe on the chip (ROOFLINE.md lever #1;
trt_engine.cc int8 mode + trt_calibrator.cc parity question).

Measures, in one TPU process, at the bench's dominant width W=15360:
  1. whether XLA:TPU lowers s8 x s8 -> s32 convs at all (tiny smoke);
  2. forward wall-clock: serve-fold bf16 vs int8-activation graph
     (residual stream int8 and bf16 variants), roofline.py slope method;
  3. accuracy: top-1 policy agreement + |value delta| vs the bf16 folded
     graph on random-playout positions (calibration on a disjoint set);
  4. native-vs-emulated integer parity at small width (the CPU test's
     guarantee re-checked on the real lowering).

Usage: python benchmarks/int8_serve_probe.py   (TPU env, ONE process)
       INT8_W=4096 to shrink; INT8_SKIP_TIMING=1 for accuracy only.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

W = int(os.environ.get("INT8_W", "15360"))
N_LO, N_HI = 4, 16


def slope_ms(make_chain, *args, n_lo=N_LO, n_hi=N_HI):
    lo = jax.jit(functools.partial(make_chain, n=n_lo))
    hi = jax.jit(functools.partial(make_chain, n=n_hi))
    jax.block_until_ready(lo(*args))
    jax.block_until_ready(hi(*args))

    def t(f):
        t0 = time.time()
        jax.block_until_ready(f(*args))
        return time.time() - t0

    tlo = min(t(lo) for _ in range(3))
    thi = min(t(hi) for _ in range(3))
    return (thi - tlo) / (n_hi - n_lo) * 1000


def playout_positions(n, plies, seed):
    from p3achygo_tpu.game.board import legal_mask, new_state, step

    states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(n))
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def random_step(states, key):
        lm = jax.vmap(legal_mask)(states)
        mv = jax.random.categorical(key, jnp.where(lm, 0.0, -1e9), axis=-1)
        nxt, _ = jax.vmap(step)(states, mv.astype(jnp.int32))
        return nxt

    for _ in range(plies):
        key, ks = jax.random.split(key)
        states = random_step(states, ks)
    return states


def featurize(states, dtype):
    from p3achygo_tpu.features import batched_features

    return batched_features(states, False, planes_dtype=dtype)


def main():
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.nn.serve import serve_forward
    from p3achygo_tpu.nn.serve_q import calibrate, serve_q_forward

    # --- 1. s8 conv smoke ---
    x8 = jnp.ones((8, 19, 19, 64), jnp.int8)
    w8 = jnp.ones((3, 3, 64, 64), jnp.int8)
    try:
        y = jax.jit(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))(x8, w8)
        jax.block_until_ready(y)
        print(f"s8 conv lowering: OK (center sum {int(y[0, 9, 9, 0])} == 576)",
              flush=True)
    except Exception as e:
        print(f"s8 conv lowering: FAILED — {type(e).__name__}: {e}",
              flush=True)
        print("int8 activations blocked at the compiler; probe ends.",
              flush=True)
        return

    cfg = get_config("b12c128btl3")
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    ckpt = sys.argv[1] if len(sys.argv) > 1 else ""
    if ckpt and os.path.isdir(ckpt):
        from p3achygo_tpu.train.checkpoint import restore_checkpoint

        tmpl = {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "step": jnp.zeros((), jnp.int32)}
        full = restore_checkpoint(ckpt, tmpl)
        variables = {"params": full["params"],
                     "batch_stats": full["batch_stats"]}
        print(f"weights: {ckpt}", flush=True)
    else:
        print("weights: random-init", flush=True)

    # --- calibration (1024 positions, mixed plies) + eval set ---
    calib_states = playout_positions(
        int(os.environ.get("INT8_CALIB", "1024")), 40, seed=1)
    eval_states = playout_positions(
        int(os.environ.get("INT8_EVAL", "2048")), 80, seed=2)
    cp, cs = featurize(calib_states, jnp.bfloat16)
    ep, es = featurize(eval_states, jnp.bfloat16)
    scales = {}
    for ri8 in (True, False):
        scales[ri8] = jax.jit(functools.partial(
            calibrate, model, variables, residual_int8=ri8))(cp, cs)
    print(f"calibrated {len(scales[True])} sites", flush=True)

    # --- 4. native vs emulated at small width ---
    nat = serve_q_forward(model, variables, ep[:256], es[:256],
                          scales=scales[True], native=True)
    emu = serve_q_forward(model, variables, ep[:256], es[:256],
                          scales=scales[True], native=False)
    d = np.max(np.abs(np.asarray(nat.pi_logits) - np.asarray(emu.pi_logits)))
    print(f"native-vs-emulated max |pi delta|: {d:.2e}", flush=True)

    # --- 3. accuracy vs bf16 folded graph ---
    ref = serve_forward(model, variables, ep, es)
    for ri8 in (True, False):
        got = serve_q_forward(model, variables, ep, es, scales=scales[ri8],
                              native=True, residual_int8=ri8)
        top_r = np.argmax(np.asarray(ref.pi_logits), -1)
        top_q = np.argmax(np.asarray(got.pi_logits), -1)
        agree = float((top_r == top_q).mean())
        vr = np.asarray(ref.outcome_probs)[:, 1]
        vq = np.asarray(got.outcome_probs)[:, 1]
        vd = np.abs(vr - vq)
        print(f"[res_int8={ri8}] top-1 agreement {agree:.4f}  "
              f"|value delta| mean {vd.mean():.4f} p95 "
              f"{np.percentile(vd, 95):.4f}", flush=True)

    if os.environ.get("INT8_SKIP_TIMING"):
        return

    # --- 2. timing at W ---
    planes = jnp.concatenate([ep] * ((W + ep.shape[0] - 1) // ep.shape[0]))[:W]
    scal = jnp.concatenate([es] * ((W + es.shape[0] - 1) // es.shape[0]))[:W]

    def fwd_chain(planes, scal, n, mode, ri8=True):
        def body(i, p):
            if mode == "fold":
                out = serve_forward(model, variables, p, scal)
            else:
                out = serve_q_forward(model, variables, p, scal,
                                      scales=scales[ri8], native=True,
                                      residual_int8=ri8)
            return p + (out.pi_logits[0, 0] * 1e-9).astype(p.dtype)
        return lax.fori_loop(0, n, body, planes)

    ms_fold = slope_ms(functools.partial(fwd_chain, mode="fold"),
                       planes, scal)
    print(f"fwd serve-fold bf16  W={W}: {ms_fold:.1f} ms", flush=True)
    for ri8 in (True, False):
        ms_q = slope_ms(functools.partial(fwd_chain, mode="q", ri8=ri8),
                        planes, scal)
        print(f"fwd int8-act (res_int8={ri8}) W={W}: {ms_q:.1f} ms "
              f"({ms_fold / ms_q:.2f}x vs fold)", flush=True)


if __name__ == "__main__":
    main()
