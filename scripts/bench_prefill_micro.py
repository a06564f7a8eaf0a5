"""Microbench: isolate the embed engine's PREFILL-phase device rates.

The round-4 serving profile (PERF.md) leaves prefill as the engine's
largest phase (first_prefill 38% + refill_prefill 16% of wall at the
2B/w8a8/C=128/64-slot operating point) and attributes the residual to
"prefill kernel work". This bench separates that claim into parts, each
timed in isolation at the exact serving shapes:

  - vision tower forward at the engine's chunk shape (vision_batch x
    1024 patches, 448^2 images), bf16 vs int8 vs w8a8;
  - the chunked-prefill LM step at (64, 128) x 3 chunks (the 296-token
    CC-SBU prompt -> 384-padded grid) and the refill shape (16, 128);
  - the first-token epilogue (lm_head logits + nucleus sampling).

Each is reported as ms/call and effective TF/s against its analytic
matmul FLOPs, so "prefill is slow" decomposes into "which op, and is it
kernel-bound or dispatch-bound" (call rate vs aggregate phase wall).

Usage:
  python -m scripts.bench_prefill_micro [--model 2b] [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def _block(x):
    """Reliable completion barrier on the axon platform (block_until_ready
    can return early there — bench.py NOTE)."""
    import jax
    leaves = jax.tree.leaves(x)
    return float(np.asarray(leaves[0].ravel()[0]))


def time_fn(fn, *args, iters=10, **kw):
    fn(*args, **kw)  # compile
    _block(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    _block(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["2b", "7b"], default="2b")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--rows", type=int, default=64,
                        help="prefill batch rows (slot count)")
    parser.add_argument("--chunk", type=int, default=128)
    parser.add_argument("--prompt-len", type=int, default=296)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny geometry smoke run (CPU-testable)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tests.test_embed_engine import FakeTokenizer
    from thinkdiff_tpu.engines.embed_engine import EmbedEngine
    from thinkdiff_tpu.models.qwen2_vl import (
        Qwen2VLConfig, Qwen2VLModel, Qwen2VisionTower,
    )

    if args.tiny:
        import dataclasses

        def mk(quant_int8=False, fused_proj=True, vision_quant=False):
            cfg = Qwen2VLConfig.tiny(quant_int8=quant_int8,
                                     fused_proj=fused_proj)
            if vision_quant:
                cfg = dataclasses.replace(cfg, vision=dataclasses.replace(
                    cfg.vision, quant_int8=vision_quant))
            return cfg

        args.rows, args.chunk, args.prompt_len, args.iters = 4, 64, 100, 2
        n_img, patches, grid_hw = 2, 64, 8
    else:
        mk = (Qwen2VLConfig.qwen2_vl_7b if args.model == "7b"
              else Qwen2VLConfig.qwen2_vl_2b)
        n_img, patches, grid_hw = 32, 1024, 32
    rng = jax.random.PRNGKey(0)

    # --- vision tower: one engine chunk (32 images x 1024 patches) ------
    print("== vision tower (448^2 -> 1024 patches, engine chunk of 32) ==")
    vision_rates = {}
    for vq in (False, True, "w8a8"):
        cfg = mk(quant_int8="w8a8", fused_proj=True, vision_quant=vq)
        vcfg = cfg.vision
        tower = Qwen2VisionTower(vcfg)
        vp = jax.jit(lambda r: tower.init(
            r, jnp.zeros((4, vcfg.patch_dim), vcfg.dtype),
            jnp.zeros((4, vcfg.head_dim // 2)),
            jnp.zeros((4, vcfg.head_dim // 2)), None)["params"])(rng)
        from thinkdiff_tpu.models.qwen2_vl import (
            vision_cos_sin, vision_rot_pos_emb,
        )
        grid = np.asarray([[1, grid_hw, grid_hw]], np.int64)
        pos_hw = vision_rot_pos_emb(grid, vcfg.spatial_merge_size)
        cos, sin = vision_cos_sin(pos_hw, vcfg.head_dim)
        hw = grid_hw * vcfg.patch_size
        pix = jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (n_img, hw, hw, 3), np.uint8))

        from thinkdiff_tpu.engines.embed_engine import patchify_normalize

        @jax.jit
        def vfn(p, x, c, s):
            pt = patchify_normalize(
                x, vcfg.patch_size, vcfg.spatial_merge_size,
                vcfg.temporal_patch_size)
            return tower.apply({"params": p}, pt.astype(vcfg.dtype), c, s,
                               None)

        dt = time_fn(vfn, vp, pix, jnp.asarray(cos), jnp.asarray(sin),
                     iters=args.iters)
        # matmul params of the tower (~0.67 B for 2B geometry) x tokens x 2
        n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vp)
                    if hasattr(p, "shape") and len(p.shape) >= 2)
        tf = 2 * n_par * n_img * patches / dt / 1e12
        name = {False: "bf16", True: "int8", "w8a8": "w8a8"}[vq]
        vision_rates[name] = (dt, tf)
        print(f"  {name:5s}: {dt*1e3:8.1f} ms/chunk  {tf:6.1f} TF/s "
              f"({n_img/dt:.0f} imgs/s vision-only)")

    # --- LM chunked prefill ---------------------------------------------
    print("== LM chunk prefill (w8a8 + fused) ==")
    cfg = mk(quant_int8="w8a8", fused_proj=True)
    lm = Qwen2VLModel(cfg)
    lp = jax.jit(lambda r: lm.init(
        r, input_ids=jnp.zeros((1, 4), jnp.int32),
        position_ids=jnp.zeros((3, 1, 4), jnp.int32))["params"])(rng)
    engine = EmbedEngine(
        cfg, {"vision": {}, "lm": lp}, FakeTokenizer(),
        max_prompt_len=1024, max_tokens=256, min_tokens=1,
        temperature=0.6, top_p=0.9, ignore_eos=True, eos_ids=[],
        prefill_chunk=args.chunk,
    )
    fn = engine._get_chunk_prefill_fn()
    c = args.chunk
    n_chunks = -(-args.prompt_len // c)
    pad_to = n_chunks * c
    cache_size = pad_to + 256
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(lp)
                if hasattr(p, "shape") and len(p.shape) >= 2)
    rs = np.random.RandomState(0)

    for m in (args.rows, 16):
        caches = [
            (jnp.zeros((m, cfg.num_kv_heads, cache_size, cfg.head_dim),
                       cfg.dtype),
             jnp.zeros((m, cfg.num_kv_heads, cache_size, cfg.head_dim),
                       cfg.dtype))
            for _ in range(cfg.num_layers)]
        ids = jnp.asarray(rs.randint(10, 1000, (m, c), np.int32))
        pos = jnp.asarray(np.broadcast_to(np.arange(c, dtype=np.int32),
                                          (3, m, c)).copy())
        img_e = jnp.zeros((m, c, cfg.hidden_size), jnp.bfloat16)
        img_m = jnp.zeros((m, c), jnp.int32)
        last_idx = jnp.full((m,), args.prompt_len - 1, jnp.int32)

        # one full prompt = n_chunks sequential calls with window growth,
        # donated caches/acc threaded through — time the WHOLE prompt.
        def full_prompt(_caches_init_ignored):
            cas = [
                (jnp.zeros_like(_caches_init_ignored[0][0]),
                 jnp.zeros_like(_caches_init_ignored[0][1]))
                for _ in range(cfg.num_layers)]
            acc = jnp.zeros((m, cfg.hidden_size), cfg.dtype)
            hid = None
            for k in range(n_chunks):
                lo = k * c
                window = min(-(-(lo + c) // 256) * 256, cache_size)
                hid, cas, acc = fn(engine.params["lm"], ids, pos, img_e,
                                   img_m, cas, jnp.full((m,), lo, jnp.int32),
                                   acc, last_idx, window)
            return hid, acc

        dt = time_fn(full_prompt, caches, iters=max(3, args.iters // 3))
        tf = 2 * n_par * m * pad_to / dt / 1e12
        print(f"  rows={m:3d} x {n_chunks} chunks of {c}: "
              f"{dt*1e3:8.1f} ms/prompt-set  {tf:6.1f} TF/s  "
              f"({dt/n_chunks*1e3:.1f} ms/chunk-call)")

    # --- first-token epilogue (lm_head + nucleus sample) ----------------
    print("== first-token epilogue ==")
    first_fn = engine._get_first_fn()
    lh = jnp.asarray(rs.randn(args.rows, cfg.hidden_size), jnp.bfloat16)
    dt = time_fn(lambda: first_fn(engine.params["lm"], lh, rng),
                 iters=args.iters)
    print(f"  rows={args.rows}: {dt*1e3:.1f} ms/call")

    # --- paged chunk decode: isolate forward / +logits / +sampling ------
    # Mirrors the serving state at the operating point: 64 slots, paged
    # pool sized like generate_many (own-prompt page counts), mean
    # context ~ prompt + half the generation.
    print("== paged chunk decode (32-step scan, serving state shapes) ==")
    engine.ignore_eos = False
    engine.eos_ids = [2]
    chunk_steps = 32
    m = args.rows
    page = engine.kv_page_size
    mp = -(-(args.prompt_len + 256 + chunk_steps) // page)
    pool_pages = 1 + m * mp
    pools = [
        (jnp.zeros((pool_pages, cfg.num_kv_heads, page, cfg.head_dim),
                   cfg.dtype),
         jnp.zeros((pool_pages, cfg.num_kv_heads, page, cfg.head_dim),
                   cfg.dtype))
        for _ in range(cfg.num_layers)]
    table = jnp.asarray(
        np.arange(1, 1 + m * mp, dtype=np.int32).reshape(m, mp))
    tok0 = jnp.asarray(rs.randint(10, 1000, (m,), np.int32))
    clen = jnp.full((m,), args.prompt_len + 40, jnp.int32)
    pos0 = clen
    gcnt = jnp.full((m,), 40, jnp.int32)

    full_fn = engine._get_paged_chunk_fn(chunk_steps, engine.min_tokens,
                                         engine.temperature, engine.top_p)

    def run_full(pl):
        pl2 = [(jnp.zeros_like(k), jnp.zeros_like(v)) for k, v in pl]
        return full_fn(engine.params["lm"], pl2, table, tok0, clen, pos0,
                       gcnt, rng)

    dt_full = time_fn(run_full, pools, iters=max(3, args.iters // 3))

    def make_scan(with_logits, greedy):
        @jax.jit
        def f(params, pools_in, tbl, toks, cl, p0):
            def step(carry, i):
                pl, tk, c, p = carry
                pos3 = jnp.broadcast_to(p[None, :, None], (3, p.shape[0], 1))
                _, hidden, pl = engine.lm.apply(
                    {"params": params}, input_ids=tk[:, None],
                    position_ids=pos3, caches=pl, cache_len=c,
                    compute_logits=False, page_table=tbl)
                if with_logits:
                    lg = engine.lm.apply({"params": params}, hidden[:, 0],
                                         method=engine.lm.logits)
                    nxt = (jnp.argmax(lg, -1).astype(jnp.int32) if greedy
                           else tk)
                else:
                    nxt = tk
                return (pl, nxt, c + 1, p + 1), hidden[:, 0, 0]
            (pl, tk, c, p), out = jax.lax.scan(
                step, (pools_in, toks, cl, p0), jnp.arange(chunk_steps))
            return out
        return f

    for name, f in (("fwd only", make_scan(False, False)),
                    ("fwd+logits+argmax", make_scan(True, True))):
        def run(pl, _f=f):
            pl2 = [(jnp.zeros_like(k), jnp.zeros_like(v)) for k, v in pl]
            return _f(engine.params["lm"], pl2, table, tok0, clen, pos0)
        dt = time_fn(run, pools, iters=max(3, args.iters // 3))
        print(f"  {name:18s}: {dt/chunk_steps*1e3:7.2f} ms/step")
    print(f"  {'full (nucleus)':18s}: {dt_full/chunk_steps*1e3:7.2f} ms/step"
          f"  (engine fn, k={engine.top_k_prefilter} prefilter)")


if __name__ == "__main__":
    main()
