"""Measured CogVideoX-5b-scale denoise step + VAE decode on ONE TPU chip.

Operating point = the reference video script's published settings
(reference scripts/test/test_blip_vision_t5_decoder_cogvideo.py:116-186):
49 frames at 480x720, 50 DDIM steps, guidance 6 (classifier-free guidance
=> every denoise step is ONE batch-2 transformer forward), 226-token text
budget. Latents: temporal 4x + spatial 8x VAE compression, 2x2 patchify
-> 13 x 30 x 45 = 17550 video tokens + 226 text.

5b bf16 weights are ~11 GiB — with 17.8k-token activations that leaves no
headroom on a 16 GiB v5e, so the default mode is weight-only int8 (5.6 GiB,
same QDense machinery as the FLUX bench). Weights are generated ON DEVICE
(synthetic values, real compute — step cost does not depend on values).

Prints one JSON line: ms/step, steps/s, e2e seconds for the 50-step clip
(transformer) and the 3D-causal-VAE decode seconds, measured separately.

Usage:
  python -m scripts.bench_cogvideo                  # 480p49, int8
  python -m scripts.bench_cogvideo --mode w8a8
  python -m scripts.bench_cogvideo --frames 17 --height 256 --width 256
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.bench_flux_dev import device_random_params  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from thinkdiff_tpu.models.cogvideox import (
        CogVideoXConfig, CogVideoXTransformer)

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int8", choices=["w8a8", "int8", "bf16"])
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--txt-len", type=int, default=226)
    ap.add_argument("--steps", type=int, default=50,
                    help="denoise step count for the e2e seconds estimate")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--skip-vae", action="store_true")
    args = ap.parse_args()

    quant = {"w8a8": "w8a8", "int8": True, "bf16": False}[args.mode]
    cfg = CogVideoXConfig.cogvideox_5b(quant_int8=quant)

    # latent geometry: temporal (f-1)/4+1, spatial /8, then 2x2 patchify
    lt = (args.frames - 1) // 4 + 1
    lh, lw = args.height // 8, args.width // 8
    s_vid = lt * (lh // cfg.patch_size) * (lw // cfg.patch_size)
    rs = np.random.RandomState(0)
    # batch 2: CFG cond + uncond in one forward (the pipeline's concat)
    lat = jnp.asarray(rs.randn(2, lt, lh, lw, cfg.in_channels) * 0.1,
                      jnp.bfloat16)
    txt = jnp.asarray(rs.randn(2, args.txt_len, cfg.text_dim) * 0.1,
                      jnp.bfloat16)
    ts = jnp.asarray([500, 500], jnp.int32)
    fargs = (lat, txt, ts)

    model = CogVideoXTransformer(cfg)
    t0 = time.perf_counter()
    params = device_random_params(model, fargs)
    nbytes = sum(l.size * l.dtype.itemsize
                 for l in jax.tree_util.tree_leaves(params))
    print(f"params on device: {nbytes/2**30:.1f} GiB "
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
    print(f"transformer: {dt*1e3:.1f} ms/step", file=sys.stderr)

    # free the 5b tower before the VAE phase — both resident at once OOM a
    # 16 GiB chip (measured: first VAE tile died with the transformer live)
    nparams = sum(l.size for l in jax.tree_util.tree_leaves(params)
                  if l.ndim == 2)
    for leaf in jax.tree_util.tree_leaves(params):
        leaf.delete()
    del params, out

    vae_seconds = None
    if not args.skip_vae:
        from thinkdiff_tpu.models.cogvideox_vae import (
            CogVideoXVAEConfig, CogVideoXVAEDecoder, decode_latents)

        vcfg = CogVideoXVAEConfig.cogvideox_5b()
        dec = CogVideoXVAEDecoder(vcfg)
        z = jnp.asarray(rs.randn(1, lt, lh, lw, vcfg.latent_channels) * 0.1,
                        jnp.bfloat16)
        vparams = device_random_params(dec, (z,))
        # decode_latents auto-tiles: monolithic 49f/480p wants 41 GiB HBM
        t0 = time.perf_counter()
        frames = decode_latents(dec, vparams, z, scaling_factor=1.0)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        frames = decode_latents(dec, vparams, z, scaling_factor=1.0)
        vae_seconds = time.perf_counter() - t0
        print(f"vae decode: compile+first {compile_s:.1f}s, "
              f"steady {vae_seconds:.1f}s, out {frames.shape}",
              file=sys.stderr)

    s_tot = s_vid + args.txt_len
    p_mat = nparams
    # batch-2 forward: 2x matmul flops + per-layer joint attention
    fl = 2 * (2 * p_mat * s_tot) + cfg.num_layers * 2 * 4 * s_tot * s_tot \
        * cfg.hidden_size
    result = {
        "metric": "cogvideox_5b_denoise_steps_per_sec_per_chip",
        "mode": args.mode,
        "frames": args.frames,
        "resolution": f"{args.height}x{args.width}",
        "s_vid": s_vid, "s_txt": args.txt_len,
        "ms_per_step": round(dt * 1e3, 1),
        "steps_per_sec": round(1.0 / dt, 3),
        "tflops_per_sec": round(fl / dt / 1e12, 1),
        "clip_seconds_transformer": round(args.steps * dt, 1),
    }
    if vae_seconds is not None:
        result["vae_decode_seconds"] = round(vae_seconds, 1)
        result["clip_seconds_e2e"] = round(args.steps * dt + vae_seconds, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
