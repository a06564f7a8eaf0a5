"""Video output path: CogVideoX 3D causal VAE decoder (shapes, temporal
causality, converter layout) + dependency-free MJPEG-AVI write/read."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thinkdiff_tpu.data.video_io import VideoReader, save_video
from thinkdiff_tpu.models.cogvideox_vae import (
    CogVideoXVAEConfig, CogVideoXVAEDecoder, convert_cogvideox_vae,
    decode_latents,
)


def _tiny_decoder():
    cfg = CogVideoXVAEConfig.tiny()
    dec = CogVideoXVAEDecoder(cfg)
    z = jnp.zeros((1, 3, 4, 4, cfg.latent_channels))
    params = dec.init(jax.random.PRNGKey(0), z)["params"]
    return cfg, dec, params


class TestVAEDecoder:
    def test_output_shape_and_temporal_upsampling(self):
        cfg, dec, params = _tiny_decoder()
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, 4))
        video = dec.apply({"params": params}, z)
        # tiny cfg: 2 blocks, 1 spatial upsample (2x), temporal ratio 2 ->
        # one compress_time block: T 3 -> 2*3-1 = 5
        assert video.shape == (1, 5, 8, 8, 3)

    def test_causal_conv_temporal_padding(self):
        """CausalConv3d frame t must not see input frames > t (left pad with
        copies of the FIRST frame, never the future). Note the full decoder
        is not strictly frame-causal — its group norms reduce over time,
        exactly like the original's GroupNorm over (C, T, H, W)."""
        from thinkdiff_tpu.models.cogvideox_vae import CausalConv3d

        conv = CausalConv3d(4, (3, 3, 3))
        x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4))
        params = conv.init(jax.random.PRNGKey(0), x1)["params"]
        x2 = x1.at[:, 3].set(
            jax.random.normal(jax.random.PRNGKey(3), (8, 8, 4)))
        y1 = conv.apply({"params": params}, x1)
        y2 = conv.apply({"params": params}, x2)
        # frames 0..2 unchanged; frame 3 changed
        np.testing.assert_allclose(
            np.asarray(y1[:, :3]), np.asarray(y2[:, :3]), atol=1e-6)
        assert float(jnp.max(jnp.abs(y1[:, 3] - y2[:, 3]))) > 1e-4
        # first-frame left padding: a constant-in-time input stays constant
        xc = jnp.broadcast_to(x1[:, :1], x1.shape)
        yc = conv.apply({"params": params}, xc)
        np.testing.assert_allclose(
            np.asarray(yc[:, 0]), np.asarray(yc[:, -1]), atol=1e-5)

    def test_decode_latents_uint8(self):
        cfg, dec, params = _tiny_decoder()
        z = np.random.RandomState(0).randn(1, 3, 4, 4, 4).astype(np.float32)
        frames = decode_latents(dec, params, z)
        assert frames.dtype == np.uint8
        assert frames.shape == (1, 5, 8, 8, 3)

    def test_converter_layout_roundtrip(self):
        """Build a torch-layout state dict for the tiny geometry, convert,
        and run the decoder with it (validates naming + transposes)."""
        cfg, dec, params = _tiny_decoder()
        rs = np.random.RandomState(0)
        sd = {}

        def put_causal(prefix, pt):  # flax (kt,kh,kw,I,O) -> torch (O,I,...)
            k = np.asarray(pt["conv"]["kernel"])
            sd[f"{prefix}.conv.weight"] = rs.randn(*np.transpose(
                k, (4, 3, 0, 1, 2)).shape).astype(np.float32)
            sd[f"{prefix}.conv.bias"] = rs.randn(k.shape[-1]).astype(np.float32)

        def put_norm(prefix, pt):
            n = np.asarray(pt["norm_layer"]["scale"])
            sd[f"{prefix}.norm_layer.weight"] = rs.randn(*n.shape).astype(np.float32)
            sd[f"{prefix}.norm_layer.bias"] = rs.randn(*n.shape).astype(np.float32)
            put_causal(f"{prefix}.conv_y", pt["conv_y"])
            put_causal(f"{prefix}.conv_b", pt["conv_b"])

        def put_resnet(prefix, pt):
            put_norm(f"{prefix}.norm1", pt["norm1"])
            put_causal(f"{prefix}.conv1", pt["conv1"])
            put_norm(f"{prefix}.norm2", pt["norm2"])
            put_causal(f"{prefix}.conv2", pt["conv2"])
            if "conv_shortcut" in pt:
                put_causal(f"{prefix}.conv_shortcut", pt["conv_shortcut"])

        put_causal("decoder.conv_in", params["conv_in"])
        for i in range(2):
            put_resnet(f"decoder.mid_block.resnets.{i}", params[f"mid_res_{i}"])
        bi = 0
        while f"up_{bi}_res_0" in params:
            ri = 0
            while f"up_{bi}_res_{ri}" in params:
                put_resnet(f"decoder.up_blocks.{bi}.resnets.{ri}",
                           params[f"up_{bi}_res_{ri}"])
                ri += 1
            if f"up_{bi}_upsample" in params:
                k = np.asarray(params[f"up_{bi}_upsample"]["conv"]["kernel"])
                sd[f"decoder.up_blocks.{bi}.upsamplers.0.conv.weight"] = \
                    rs.randn(*np.transpose(k, (3, 2, 0, 1)).shape).astype(np.float32)
                sd[f"decoder.up_blocks.{bi}.upsamplers.0.conv.bias"] = \
                    rs.randn(k.shape[-1]).astype(np.float32)
            bi += 1
        put_norm("decoder.norm_out", params["norm_out"])
        put_causal("decoder.conv_out", params["conv_out"])

        converted = convert_cogvideox_vae(sd)
        # exact tree structure match with the flax init
        flat_c = jax.tree_util.tree_structure(converted)
        flat_p = jax.tree_util.tree_structure(params)
        assert flat_c == flat_p
        shapes_c = jax.tree.map(lambda a: np.asarray(a).shape, converted)
        shapes_p = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert shapes_c == shapes_p
        z = jnp.zeros((1, 3, 4, 4, 4))
        out = dec.apply({"params": jax.tree.map(jnp.asarray, converted)}, z)
        assert out.shape == (1, 5, 8, 8, 3)


class TestVideoIO:
    def _frames(self, n=5, h=32, w=48):
        rs = np.random.RandomState(0)
        # smooth gradients survive JPEG nearly exactly
        base = np.linspace(0, 255, w, dtype=np.uint8)
        return [np.broadcast_to(base, (h, w)).astype(np.uint8)[..., None]
                .repeat(3, -1) + i for i in range(n)]

    def test_avi_roundtrip(self, tmp_path):
        frames = self._frames()
        path = save_video(frames, str(tmp_path / "out.avi"), fps=8)
        assert path.endswith(".avi")
        r = VideoReader(path)
        assert len(r) == 5
        got = r.get_batch([0, 4])
        assert got.shape == (2, 32, 48, 3)
        # JPEG quality 92 on smooth content: close to source
        assert np.mean(np.abs(got[0].astype(int)
                              - np.asarray(frames[0], int))) < 6
        assert r[-1].shape == (32, 48, 3)

    def test_png_dir_and_mp4_fallback(self, tmp_path):
        frames = self._frames(n=3)
        d = save_video(frames, str(tmp_path / "framesdir") + "/", fps=8)
        r = VideoReader(d.rstrip("/"))
        assert len(r) == 3
        # mp4: cv2 (in-process avcodec) or ffmpeg produce a real .mp4;
        # with neither it degrades to .avi next to the requested path
        import shutil as _sh

        from thinkdiff_tpu.data.video_io import _cv2

        out = save_video(frames, str(tmp_path / "clip.mp4"), fps=8)
        if _cv2() is not None or _sh.which("ffmpeg"):
            assert out.endswith(".mp4")
        else:
            assert out.endswith(".avi")
            assert len(VideoReader(out)) == 3

    def test_mp4_roundtrip_cv2(self, tmp_path):
        """mp4 write + read through the in-process avcodec tier — the
        decord-parity container path (reference data_utils.py:18-29 reads
        mp4 clips via decord; here cv2's FFMPEG backend decodes them)."""
        from thinkdiff_tpu.data.video_io import _cv2

        if _cv2() is None:
            pytest.skip("cv2 FFMPEG backend not available")
        frames = self._frames(n=6)
        path = save_video(frames, str(tmp_path / "clip.mp4"), fps=12)
        assert path.endswith(".mp4")
        with open(path, "rb") as f:
            head = f.read(12)
        assert head[4:8] == b"ftyp"  # genuine ISO-BMFF/mp4 container
        r = VideoReader(path)
        assert len(r) == 6
        assert abs(r.get_avg_fps() - 12.0) < 0.5
        got = r.get_batch([1, 5])
        assert got.shape == (2, 32, 48, 3)
        # lossy codec on smooth gradients: close to source
        assert np.mean(np.abs(got[1].astype(int)
                              - np.asarray(frames[5], int))) < 8
        # random access beyond the sequential cache, then behind it
        assert r[-1].shape == (32, 48, 3)
        assert r[0].shape == (32, 48, 3)


@pytest.mark.slow
def test_cogvideo_script_end_to_end(tmp_path, monkeypatch):
    """Drive the cogvideo CLI main() with tiny models: image -> vision
    tokens + text embeds -> CogVideoX sampling -> 3D VAE decode -> playable
    AVI on disk, read back with VideoReader."""
    import sys

    import yaml

    from PIL import Image

    import scripts.test.test_blip_vision_t5_decoder_cogvideo as script
    import thinkdiff_tpu.engines.pipeline as pipeline_mod
    import thinkdiff_tpu.models.cogvideox as cv
    import thinkdiff_tpu.models.cogvideox_vae as cvv
    from thinkdiff_tpu.models.cogvideox import CogVideoXConfig

    rs = np.random.RandomState(0)
    img_path = str(tmp_path / "in.jpg")
    Image.fromarray((rs.rand(28, 28, 3) * 255).astype("uint8")).save(img_path)

    tiny_cfg = CogVideoXConfig.tiny(text_dim=16)
    d_cond = tiny_cfg.text_embed_dim if hasattr(tiny_cfg, "text_embed_dim") \
        else tiny_cfg.hidden_size

    # shims: no weights in env
    monkeypatch.setattr(script, "VISION_TOKEN_BUDGET", 3, raising=False)
    monkeypatch.setattr(
        "thinkdiff_tpu.models.base.maybe_load_hf_weights",
        lambda path: {"dummy": np.zeros(1)})
    monkeypatch.setattr(cv, "convert_cogvideox", lambda sd, dtype=None: None)
    monkeypatch.setattr(cv.CogVideoXConfig, "cogvideox_5b",
                        classmethod(lambda cls, **kw: tiny_cfg))
    monkeypatch.setattr(cvv.CogVideoXVAEConfig, "cogvideox_5b",
                        classmethod(lambda cls, **kw: cvv.CogVideoXVAEConfig.tiny()))
    vae_cfg = cvv.CogVideoXVAEConfig.tiny()
    vae_dec = cvv.CogVideoXVAEDecoder(vae_cfg)
    vae_params = vae_dec.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 4, 4, vae_cfg.latent_channels)))["params"]
    monkeypatch.setattr(cvv, "convert_cogvideox_vae",
                        lambda sd, dtype=None: vae_params)
    real_sampler = cv.CogVideoXSampler

    class TinySampler(real_sampler):
        def __init__(self, cfg, params, **kw):
            model = cv.CogVideoXTransformer(cfg)
            p = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 2, 4, 4, cfg.in_channels)),
                jnp.zeros((1, 3, cfg.text_dim if hasattr(cfg, 'text_dim')
                           else 16)),
                jnp.zeros((1,)),
            )["params"]
            super().__init__(cfg, p, **kw)

    monkeypatch.setattr(cv, "CogVideoXSampler", TinySampler)
    monkeypatch.setattr(script, "TOTAL_TOKEN_BUDGET", 6, raising=False)

    class FakeEmbedder:
        def __call__(self, text, max_len=None):
            return rs.randn(1, min(max_len or 3, 3), 16).astype(np.float32)

    monkeypatch.setattr(pipeline_mod.T5TextEmbedder, "from_pretrained",
                        classmethod(lambda cls, *a, **k: FakeEmbedder()))

    cfg = {
        "model": {
            "arch": "blip-vision-t5-decoder", "dtype": "float32",
            "load_pretrained": False, "mm_projector_type": "mlp2x_gelu_t5_norm",
            "t5_config": dict(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                              num_layers=1, num_decoder_layers=1, num_heads=2,
                              dropout_rate=0.0),
            "vision_config": dict(hidden_size=16, intermediate_size=32,
                                  num_layers=2, num_heads=4, image_size=28,
                                  patch_size=14),
        },
        "datasets": {},
        "run": {
            "task": "image_text_pretrain", "seed": 0,
            "image_path": img_path, "text_input": "a tiny video",
            "image_size": 28,
            "num_frames": 2, "latent_height": 4, "latent_width": 4,
            "num_inference_steps": 2, "guidance_scale": 6.0,
            "output_dir": str(tmp_path / "out"),
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    monkeypatch.setattr(sys, "argv", ["cogvideo", "--cfg-path", str(cfg_path)])
    script.main()

    # mp4 via the in-process avcodec tier when available (the reference's
    # export_to_video container), MJPEG-AVI otherwise
    vids = (list((tmp_path / "out").glob("*.mp4"))
            or list((tmp_path / "out").glob("*.avi")))
    assert vids, list((tmp_path / "out").iterdir())
    r = VideoReader(str(vids[0]))
    assert len(r) >= 2
    assert r[0].ndim == 3 and r[0].shape[-1] == 3


class TestTiledDecode:
    def test_single_tile_is_exact(self):
        """Tile covering the whole latent => bitwise the monolithic path."""
        cfg, dec, params = _tiny_decoder()
        z = np.random.RandomState(0).randn(1, 3, 6, 8, 4).astype(np.float32)
        mono = decode_latents(dec, params, z, tile=None)
        one = decode_latents(dec, params, z, tile=(6, 8))
        np.testing.assert_array_equal(mono, one)

    def test_tiled_blend_close_to_monolithic(self):
        """2x2 overlapping tiles: seams blended, output near-monolithic.
        The decoder's spatial receptive field exceeds the overlap so small
        deviations at seams are expected (same contract as diffusers
        tiled_decode); interior pixels must be closer still."""
        cfg, dec, params = _tiny_decoder()
        z = np.random.RandomState(1).randn(1, 3, 12, 16, 4).astype(np.float32)
        mono = decode_latents(dec, params, z, tile=None).astype(np.int32)
        tiled = decode_latents(dec, params, z, tile=(8, 10),
                               tile_overlap=4).astype(np.int32)
        assert tiled.shape == mono.shape
        mad = np.abs(tiled - mono).mean()
        assert mad < 6.0, f"tiled decode diverges: mean abs diff {mad}"
        # shapes uniform: last-column/last-row tiles were clamped, not shrunk
        assert tiled.dtype == np.int32 and np.isfinite(mad)
