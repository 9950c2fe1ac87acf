"""GFPGAN v1 "clean" structural checkpoint-conversion proof.

Same pattern as tests/test_official_checkpoints.py (RRDBNet/IFNet): the
official GFPGANv1Clean generator (public architecture, written from spec —
U-Net SFT-condition encoder + StyleGAN2-clean decoder, the graph inside
``GFPGANv1.4.pth``; the reference invokes it at
face_restoration_expert.py:311-355) is instantiated in torch with random
weights, its state_dict converts through the SAME code path a real
checkpoint would use, and the JAX mirror (models/official_gfpgan.py) must
reproduce the torch forward numerically at fp32. Tiny channel table
(narrow=1/32) keeps the CPU cost trivial; the key STRUCTURE is identical
to the released 512px model."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional


# --- official torch graph (public architecture, written from spec) ----------


class NormStyleCode(tnn.Module):
    def forward(self, x):
        return x * torch.rsqrt(torch.mean(x ** 2, dim=-1, keepdim=True)
                               + 1e-8)


class ModulatedConv2d(tnn.Module):
    def __init__(self, cin, cout, k, nsf, demodulate=True,
                 sample_mode=None, eps=1e-8):
        super().__init__()
        self.cout, self.k = cout, k
        self.demodulate, self.sample_mode, self.eps = (demodulate,
                                                       sample_mode, eps)
        self.modulation = tnn.Linear(nsf, cin, bias=True)
        self.weight = tnn.Parameter(
            torch.randn(1, cout, cin, k, k) / math.sqrt(cin * k * k))
        self.padding = k // 2

    def forward(self, x, style):
        b, c, h, w = x.shape
        style = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.weight * style
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + self.eps)
            weight = weight * demod.view(b, self.cout, 1, 1, 1)
        weight = weight.view(b * self.cout, c, self.k, self.k)
        if self.sample_mode == "upsample":
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
        elif self.sample_mode == "downsample":
            x = F.interpolate(x, scale_factor=0.5, mode="bilinear",
                              align_corners=False)
        b, c, h, w = x.shape
        out = F.conv2d(x.view(1, b * c, h, w), weight,
                       padding=self.padding, groups=b)
        return out.view(b, self.cout, *out.shape[2:4])


class StyleConv(tnn.Module):
    def __init__(self, cin, cout, k, nsf, sample_mode=None):
        super().__init__()
        self.modulated_conv = ModulatedConv2d(cin, cout, k, nsf,
                                              demodulate=True,
                                              sample_mode=sample_mode)
        self.weight = tnn.Parameter(torch.zeros(1))
        self.bias = tnn.Parameter(torch.zeros(1, cout, 1, 1))
        self.activate = tnn.LeakyReLU(0.2, True)

    def forward(self, x, style, noise):
        out = self.modulated_conv(x, style) * 2 ** 0.5
        out = out + self.weight * noise
        return self.activate(out + self.bias)


class ToRGB(tnn.Module):
    def __init__(self, cin, nsf, upsample=True):
        super().__init__()
        self.upsample = upsample
        self.modulated_conv = ModulatedConv2d(cin, 3, 1, nsf,
                                              demodulate=False)
        self.bias = tnn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = F.interpolate(skip, scale_factor=2, mode="bilinear",
                                     align_corners=False)
            out = out + skip
        return out


class ConstantInput(tnn.Module):
    def __init__(self, c, size=4):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(1, c, size, size))

    def forward(self, b):
        return self.weight.repeat(b, 1, 1, 1)


class StyleGAN2GeneratorCSFT(tnn.Module):
    def __init__(self, out_size, nsf, num_mlp, channels, sft_half):
        super().__init__()
        self.sft_half = sft_half
        self.log_size = int(math.log2(out_size))
        self.num_latent = self.log_size * 2 - 2
        self.num_layers = (self.log_size - 2) * 2 + 1
        layers = [NormStyleCode()]
        for _ in range(num_mlp):
            layers += [tnn.Linear(nsf, nsf, bias=True),
                       tnn.LeakyReLU(0.2, True)]
        self.style_mlp = tnn.Sequential(*layers)
        self.constant_input = ConstantInput(channels[4])
        self.style_conv1 = StyleConv(channels[4], channels[4], 3, nsf)
        self.to_rgb1 = ToRGB(channels[4], nsf, upsample=False)
        self.style_convs = tnn.ModuleList()
        self.to_rgbs = tnn.ModuleList()
        self.noises = tnn.Module()
        for i in range(self.num_layers):
            r = 2 ** ((i + 5) // 2)
            self.noises.register_buffer(f"noise{i}", torch.randn(1, 1, r, r))
        cin = channels[4]
        for i in range(3, self.log_size + 1):
            cout = channels[2 ** i]
            self.style_convs.append(StyleConv(cin, cout, 3, nsf,
                                              sample_mode="upsample"))
            self.style_convs.append(StyleConv(cout, cout, 3, nsf))
            self.to_rgbs.append(ToRGB(cout, nsf))
            cin = cout

    def forward(self, styles, conditions, input_is_latent):
        if not input_is_latent:
            styles = [self.style_mlp(s) for s in styles]
        latent = styles[0]
        if latent.ndim < 3:
            latent = latent.unsqueeze(1).repeat(1, self.num_latent, 1)
        noise = [getattr(self.noises, f"noise{i}")
                 for i in range(self.num_layers)]
        out = self.constant_input(latent.shape[0])
        out = self.style_conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for conv1, conv2, n1, n2, to_rgb in zip(
                self.style_convs[::2], self.style_convs[1::2],
                noise[1::2], noise[2::2], self.to_rgbs):
            out = conv1(out, latent[:, i], n1)
            if i < len(conditions):
                if self.sft_half:
                    same, sft = torch.split(out, out.size(1) // 2, dim=1)
                    sft = sft * conditions[i - 1] + conditions[i]
                    out = torch.cat([same, sft], dim=1)
                else:
                    out = out * conditions[i - 1] + conditions[i]
            out = conv2(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


class ResBlock(tnn.Module):
    def __init__(self, cin, cout, mode):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cin, 3, 1, 1)
        self.conv2 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = tnn.Conv2d(cin, cout, 1, bias=False)
        self.scale = 0.5 if mode == "down" else 2.0

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = F.interpolate(out, scale_factor=self.scale, mode="bilinear",
                            align_corners=False)
        out = F.leaky_relu(self.conv2(out), 0.2)
        x = F.interpolate(x, scale_factor=self.scale, mode="bilinear",
                          align_corners=False)
        return out + self.skip(x)


class GFPGANv1Clean(tnn.Module):
    """Key structure identical to GFPGANv1.4.pth (params_ema)."""

    def __init__(self, out_size, nsf, num_mlp, dec_channels, unet_channels,
                 different_w=True, sft_half=True, input_is_latent=True):
        super().__init__()
        self.log_size = int(math.log2(out_size))
        self.nsf, self.different_w = nsf, different_w
        self.input_is_latent = input_is_latent
        ch = unet_channels
        self.conv_body_first = tnn.Conv2d(3, ch[out_size], 1)
        self.conv_body_down = tnn.ModuleList()
        cin = ch[out_size]
        for i in range(self.log_size, 2, -1):
            cout = ch[2 ** (i - 1)]
            self.conv_body_down.append(ResBlock(cin, cout, "down"))
            cin = cout
        self.final_conv = tnn.Conv2d(cin, ch[4], 3, 1, 1)
        self.conv_body_up = tnn.ModuleList()
        self.toRGB = tnn.ModuleList()
        self.condition_scale = tnn.ModuleList()
        self.condition_shift = tnn.ModuleList()
        cin = ch[4]
        for i in range(3, self.log_size + 1):
            cout = ch[2 ** i]
            self.conv_body_up.append(ResBlock(cin, cout, "up"))
            self.toRGB.append(tnn.Conv2d(cout, 3, 1))
            sft_out = cout if sft_half else cout * 2
            self.condition_scale.append(tnn.Sequential(
                tnn.Conv2d(cout, cout, 3, 1, 1), tnn.LeakyReLU(0.2, True),
                tnn.Conv2d(cout, sft_out, 3, 1, 1)))
            self.condition_shift.append(tnn.Sequential(
                tnn.Conv2d(cout, cout, 3, 1, 1), tnn.LeakyReLU(0.2, True),
                tnn.Conv2d(cout, sft_out, 3, 1, 1)))
            cin = cout
        lin_out = ((self.log_size * 2 - 2) * nsf if different_w else nsf)
        self.final_linear = tnn.Linear(ch[4] * 4 * 4, lin_out)
        self.stylegan_decoder = StyleGAN2GeneratorCSFT(
            out_size, nsf, num_mlp, dec_channels, sft_half)

    def forward(self, x):
        feat = F.leaky_relu(self.conv_body_first(x), 0.2)
        skips = []
        for blk in self.conv_body_down:
            feat = blk(feat)
            skips.insert(0, feat)
        feat = F.leaky_relu(self.final_conv(feat), 0.2)
        style_code = self.final_linear(feat.reshape(feat.size(0), -1))
        if self.different_w:
            style_code = style_code.view(style_code.size(0), -1, self.nsf)
        conditions = []
        for i in range(self.log_size - 2):
            feat = feat + skips[i]
            feat = self.conv_body_up[i](feat)
            conditions.append(self.condition_scale[i](feat).clone())
            conditions.append(self.condition_shift[i](feat).clone())
        return self.stylegan_decoder([style_code], conditions,
                                     self.input_is_latent)


# --- test --------------------------------------------------------------------


def _channels(narrow):
    return {r: int(c * narrow)
            for r, c in {4: 512, 8: 512, 16: 512, 32: 512, 64: 512,
                         128: 256, 256: 128, 512: 64, 1024: 32}.items()}


def test_face_handler_serves_converted_gfpgan(tmp_path):
    """FaceRestorationExpert loads a converted GFPGAN checkpoint when
    provided (the reference's GFPGANer path,
    face_restoration_expert.py:342-355) and restores through it."""
    import jax

    from video_enhancer_tpu.models.official_gfpgan import \
        gfpgan_official_init
    from video_enhancer_tpu.runtime.face_handler import FaceRestorationExpert
    from video_enhancer_tpu.runtime.weights import save_params

    cfg = dict(out_size=32, num_style_feat=16, num_mlp=2,
               channel_multiplier=1.0, narrow=1 / 32)
    params = gfpgan_official_init(jax.random.PRNGKey(1), **cfg)
    ckpt = tmp_path / "gfpgan_tiny.npz"
    save_params(ckpt, params)

    expert = FaceRestorationExpert(
        gfpgan_ckpt=str(ckpt),
        gfpgan_config=dict(cfg, different_w=True, sft_half=True,
                           input_is_latent=True))
    assert expert.gfpgan_params is not None
    frame = (np.random.default_rng(0).random((48, 48, 3)) * 255
             ).astype(np.uint8)
    out = expert.restore_face(frame, (8, 8, 24, 24), blend=0.6)
    assert out.shape == frame.shape and out.dtype == np.uint8
    # Without a checkpoint the GFPGAN path stays off.
    assert FaceRestorationExpert().gfpgan_params is None


@pytest.mark.parametrize("input_is_latent,different_w",
                         [(True, True),    # the GFPGANv1.4 config
                          (False, False)])  # exercises the style MLP path
def test_official_gfpgan_checkpoint_loads_and_matches(input_is_latent,
                                                      different_w):
    import jax

    from video_enhancer_tpu.models.official_gfpgan import (
        gfpgan_official_apply, gfpgan_official_init)
    from video_enhancer_tpu.runtime.weights import (convert_torch_state_dict,
                                                    unflatten_into)

    out_size, nsf, num_mlp, narrow = 32, 16, 2, 1 / 32
    torch.manual_seed(0)
    tmodel = GFPGANv1Clean(out_size, nsf, num_mlp,
                           dec_channels=_channels(narrow),
                           unet_channels=_channels(narrow * 0.5),
                           different_w=different_w, sft_half=True,
                           input_is_latent=input_is_latent)
    tmodel.eval()

    template = gfpgan_official_init(
        jax.random.PRNGKey(0), out_size=out_size, num_style_feat=nsf,
        num_mlp=num_mlp, channel_multiplier=1.0, narrow=narrow,
        different_w=different_w, sft_half=True)
    flat = convert_torch_state_dict(tmodel.state_dict())
    params, matched, skipped = unflatten_into(template, flat)
    # EVERY leaf of the JAX template must come from the checkpoint —
    # the structural-parity guarantee.
    assert not skipped, f"unmatched template leaves: {skipped[:8]}"

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        rng = np.random.default_rng(3)
        x = (rng.random((2, out_size, out_size, 3), dtype=np.float32)
             * 2.0 - 1.0)
        ours = np.asarray(gfpgan_official_apply(
            params, x, num_style_feat=nsf, different_w=different_w,
            sft_half=True, input_is_latent=input_is_latent))
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        theirs = theirs.numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape == (2, out_size, out_size, 3)
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-2)
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
