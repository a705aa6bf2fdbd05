"""Roofline: is the b12c128btl3 forward HBM-bound, and what is the
attainable selfplay ceiling on this chip? (VERDICT r4 item 1d)

Three measurements inside one process:
  1. HBM bandwidth: dependent-chain triad (y = y + a*x) slope — the
     realizable STREAM number, not the spec sheet.
  2. bf16 MXU peak: dependent 4096^3 matmul chain slope.
  3. Model forward at the bench's dominant width (W=15360), flax graph
     and serve-fold graph.

Then an ANALYTIC minimum-traffic model of the forward: per convolution =
read input + write output (TPU convs cannot host fused producers; XLA
fuses elementwise chains + residual adds into conv input/output fusions,
so ideal inter-conv elementwise cost is zero EXTRA passes); per broadcast
mix = transpose read+write, dense read+write, transpose read+write; heads
at their real widths. FLOPs counted exactly. The binding side of
max(bytes/BW, flops/peak) is the attainable forward floor; measured /
floor = headroom. Prints the implied bench ceiling using the measured
NN-vs-search split (benchmarks/results.md round 3: fast-tier step 673 ms
= 535 NN + 137 search at g=4).

Usage: python benchmarks/roofline.py  (TPU env, ONE process)
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_LO, N_HI = 4, 16
W = int(os.environ.get("ROOFLINE_W", "15360"))


def slope_ms(make_chain, *args, n_lo=N_LO, n_hi=N_HI):
    """Per-iteration cost from the (n_hi - n_lo) slope; tunnel dispatch
    noise is ~10 ms, so choose n_hi large enough that the delta >> 10 ms
    (the first run used 16 iters for the micro kernels and measured
    negative slopes — pure noise)."""
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


def triad_chain(x, y, n):
    def body(i, y):
        return y + 1.000001 * x + y * 1e-9  # reads x, reads+writes y
    return lax.fori_loop(0, n, body, y)


def matmul_chain(a, b, n):
    def body(i, a):
        return (a @ b) * (1.0 / 64.0)
    return lax.fori_loop(0, n, body, a)


def model_bytes_flops(cfg, w, dtype_bytes=2):
    """Minimum HBM bytes + exact matmul FLOPs for one forward at width w.

    Traffic model: every conv reads its input once and writes its output
    once (elementwise producers/consumers fuse into the conv fusions —
    round-4 traces show XLA:TPU does this, e.g. the 3-conv inner chains
    fuse completely); the residual add's extra stream-read fuses into the
    expand conv fusion (+1 input read); broadcast mix pays transpose
    in+out, dense in+out, transpose in+out; heads read the final stream
    per head-conv. Weights are negligible (<8 MB)."""
    P = 361
    C, Bn = cfg.channels, cfg.bottleneck_channels
    act = lambda ch: w * P * ch * dtype_bytes
    by = 0
    fl = 0

    # stem: read planes (15ch) + write stream
    by += act(15) + act(C)
    fl += w * P * 15 * C * 2 * 25  # 5x5 conv

    n_bc = sum(1 for i in range(cfg.blocks)
               if i % cfg.broadcast_interval == cfg.broadcast_interval - 1)
    n_btl = cfg.blocks - n_bc
    inner = cfg.inner_bottleneck_layers

    # btl block: reduce (read C, write Bn), inner chain (fused: read Bn,
    # write Bn ONCE if XLA fuses all inner convs — it does; conservatively
    # count each inner conv's in+out since VMEM can't always carry W
    # boards... use the OPTIMISTIC fused number and the PER-CONV number.
    btl_opt = (act(C) + act(Bn)) + (act(Bn) + act(Bn)) + \
              (act(Bn) + act(C) + act(C))  # expand: in + stream-read + out
    btl_per = (act(C) + act(Bn)) + inner * (act(Bn) + act(Bn)) + \
              (act(Bn) + act(C) + act(C))
    fl_btl = (w * P * C * Bn * 2) + inner * (w * P * Bn * Bn * 2 * 9) + \
             (w * P * Bn * C * 2)
    by_btl_opt = n_btl * btl_opt
    by_btl_per = n_btl * btl_per
    fl += n_btl * fl_btl

    # broadcast block: conv_first (C->C), transpose out+in x2, dense, conv_last
    bc = (act(C) + act(C))            # conv_first
    bc += 2 * act(C)                  # transpose to [w,C,P]
    bc += 2 * act(C)                  # dense read+write
    bc += 2 * act(C)                  # transpose back
    bc += (act(C) + act(C) + act(C))  # conv_last + stream read
    fl_bc = 2 * (w * P * C * C * 2) + w * C * P * P * 2
    by += n_bc * bc
    fl += n_bc * fl_bc

    # heads: policy conv_p/conv_g read stream (2 reads, 2 small writes),
    # value conv reads stream; score head h=[w,800,cval] fused into its
    # dense (no HBM for h); outputs small.
    hc, cv = cfg.head_channels, cfg.c_val
    by += 3 * act(C) + 3 * act(hc) + act(hc)  # p,g,v convs + p-mish pass
    fl += 3 * w * P * C * hc * 2
    fl += w * 800 * cv * 2  # score dense (mish flops ignored: VPU)
    return dict(bytes_opt=by + by_btl_opt, bytes_per=by + by_btl_per,
                flops=fl)


def main():
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.nn.serve import serve_forward

    key = jax.random.PRNGKey(0)

    # 1. HBM bandwidth
    n = 64 * 1024 * 1024  # 256 MB f32
    x = jax.random.normal(key, (n,), jnp.float32)
    y = jnp.zeros((n,), jnp.float32)
    ms = slope_ms(triad_chain, x, y, n_lo=8, n_hi=128)
    bw = 3 * n * 4 / (ms / 1000) / 1e9  # read x, read y, write y
    print(f"HBM triad: {ms:.2f} ms/iter -> {bw:.0f} GB/s", flush=True)

    # 2. MXU peak bf16
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    ms = slope_ms(matmul_chain, a, b, n_lo=8, n_hi=512)
    pk = 2 * 4096**3 / (ms / 1000) / 1e12
    print(f"bf16 4096^3 matmul: {ms:.2f} ms/iter -> {pk:.1f} TFLOP/s", flush=True)

    # 3. model forward, flax vs serve-fold
    cfg = get_config("b12c128btl3")
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    planes = (jax.random.uniform(key, (W, 19, 19, 15)) > 0.8).astype(jnp.bfloat16)
    scalars = jax.random.normal(key, (W, 8), jnp.float32) * 0.3

    def fwd_chain(planes, scalars, n, serve):
        def body(i, p):
            if serve:
                out = serve_forward(model, variables, p, scalars)
            else:
                out = model.apply(variables, p, scalars, train=False)
            # dependent chain: feed a scalar of the output back in
            return p + (out.pi_logits[0, 0] * 1e-9).astype(p.dtype)
        return lax.fori_loop(0, n, body, planes)

    ms_flax = slope_ms(functools.partial(fwd_chain, serve=False), planes, scalars)
    print(f"model fwd (flax)  W={W}: {ms_flax:.1f} ms", flush=True)
    ms_serve = slope_ms(functools.partial(fwd_chain, serve=True), planes, scalars)
    print(f"model fwd (serve) W={W}: {ms_serve:.1f} ms", flush=True)

    mb = model_bytes_flops(cfg, W)
    t_bw_opt = mb["bytes_opt"] / (bw * 1e9) * 1000
    t_bw_per = mb["bytes_per"] / (bw * 1e9) * 1000
    t_fl = mb["flops"] / (pk * 1e12) * 1000
    print(f"analytic: bytes {mb['bytes_opt']/1e9:.1f}-{mb['bytes_per']/1e9:.1f} GB, "
          f"flops {mb['flops']/1e12:.2f} TF", flush=True)
    print(f"floors @ measured: HBM {t_bw_opt:.0f}-{t_bw_per:.0f} ms, "
          f"MXU {t_fl:.0f} ms -> bound = "
          f"{'HBM' if t_bw_opt > t_fl else 'MXU'}", flush=True)
    floor = max(min(t_bw_opt, t_bw_per), t_fl)
    print(f"forward floor ~{max(t_bw_opt, t_fl):.0f} ms (optimistic fusion) "
          f"vs measured {ms_serve:.0f} ms -> headroom "
          f"{ms_serve / max(t_bw_opt, t_fl):.2f}x", flush=True)


if __name__ == "__main__":
    main()
