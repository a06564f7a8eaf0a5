"""Measured FLUX.1-dev-scale denoise step on ONE TPU chip.

The 12B dev geometry does not fit a 16 GB v5e in bf16 (24 GB weights); in
int8 (12 GB) it does. This script builds the FULL 19-double + 38-single
block transformer at dev geometry with int8 weights, runs real denoise
steps at the requested resolution, and prints a JSON line with the measured
steps/s/chip (replacing the projected number PERF.md carried in round 1).

Weights are generated ON DEVICE (jitted PRNG per leaf) — synthetic values,
real compute: a denoise step's cost does not depend on weight values.
Reference counterpart: scripts/test/test_mllama_t5_decoder_flux.py drives
diffusers' FluxPipeline (bf16, A100); BASELINE.md carries its timing.

Usage:
  python -m scripts.bench_flux_dev                     # 1024x1024, w8a8
  python -m scripts.bench_flux_dev --mode int8         # weight-only int8
  python -m scripts.bench_flux_dev --height 256 --width 256 --smoke out.png
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def device_random_params(model, example_args, seed: int = 0):
    """Materialize the param tree on device: int8 leaves uniform in
    [-127, 127], float leaves N(0, 0.02). No host->device bulk transfer,
    and ONE jit call for the whole tree — per-leaf jits cost ~1 s of
    tunnel-compile each, which at 5b scale (~700 leaves) dwarfed the
    bench itself."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example_args))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def gen_all(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, s in zip(keys, leaves):
            if jnp.issubdtype(s.dtype, jnp.integer):
                out.append(jax.random.randint(
                    k, s.shape, -127, 128, dtype=jnp.int32).astype(s.dtype))
            else:
                # small weights keep activations finite through 57 blocks
                out.append((jax.random.normal(k, s.shape, jnp.float32)
                            * 0.02).astype(s.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, gen_all(
        jax.random.PRNGKey(seed)))


def main():
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.flux import (
        FluxConfig, FluxTransformer, make_img_ids)

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="w8a8", choices=["w8a8", "int8", "bf16"])
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--txt-len", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--smoke", default=None,
                    help="also run a few-step sample + VAE decode to this PNG")
    args = ap.parse_args()

    quant = {"w8a8": "w8a8", "int8": True, "bf16": False}[args.mode]
    cfg = FluxConfig(dtype=jnp.bfloat16, quant_int8=quant)
    model = FluxTransformer(cfg)

    # packed latents: 2x2 patches of the 8x-downsampled VAE latent
    hh, ww = args.height // 16, args.width // 16
    s_img = hh * ww
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(1, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jnp.asarray(rs.randn(1, args.txt_len, cfg.joint_attention_dim),
                      jnp.bfloat16)
    pooled = jnp.asarray(rs.randn(1, cfg.pooled_projection_dim), jnp.bfloat16)
    # make_img_ids takes LATENT dims (H/8) and packs 2x2 internally
    img_ids = jnp.asarray(make_img_ids(args.height // 8, args.width // 8))
    txt_ids = jnp.zeros((args.txt_len, 3))
    fargs = (lat, txt, pooled, jnp.asarray([1.0]), img_ids, txt_ids,
             jnp.asarray([3.5]))

    t0 = time.perf_counter()
    params = device_random_params(model, fargs)
    nbytes = sum(l.size * l.dtype.itemsize
                 for l in jax.tree_util.tree_leaves(params))
    print(f"params materialized on device: {nbytes/2**30:.1f} GiB "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    step = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    t0 = time.perf_counter()
    out = step(params, *fargs)
    float(jnp.sum(out.astype(jnp.float32)))  # block (axon-safe)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(params, *fargs)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.iters

    # MXU flop estimate: 2*P*S on matmuls + attention 4*S^2*d per block
    p_mat = sum(l.size for l in jax.tree_util.tree_leaves(params)
                if l.ndim == 2)
    s_tot = s_img + args.txt_len
    fl = 2 * p_mat * s_tot + (cfg.num_double_layers + cfg.num_single_layers
                              ) * 4 * s_tot * s_tot * cfg.hidden_size
    print(json.dumps({
        "metric": "flux_dev_denoise_steps_per_sec_per_chip",
        "mode": args.mode, "resolution": f"{args.height}x{args.width}",
        "s_img": s_img, "s_txt": args.txt_len,
        "ms_per_step": round(dt * 1e3, 1),
        "steps_per_sec": round(1.0 / dt, 3),
        "tflops_per_sec": round(fl / dt / 1e12, 1),
        "image_28step_seconds": round(28 * dt, 1),
    }))

    if args.smoke:
        from thinkdiff_tpu.engines.flux_sampler import FluxSampler, save_images
        from thinkdiff_tpu.models.flux_vae import VAEConfig, VAEDecoder

        vae_cfg = VAEConfig.flux()
        vae_params = device_random_params(
            VAEDecoder(vae_cfg),
            (jnp.zeros((1, args.height // 8, args.width // 8,
                        vae_cfg.latent_channels), jnp.bfloat16),))
        sampler = FluxSampler(cfg, params, vae_cfg, vae_params)
        images = sampler.sample(txt[:, :64], pooled, height=args.height,
                                width=args.width, num_steps=4)
        save_images(images, [args.smoke])
        print(f"smoke image written to {args.smoke}", file=sys.stderr)


if __name__ == "__main__":
    main()
