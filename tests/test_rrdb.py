"""Real-ESRGAN RRDBNet stage tests (reference scripts/sample.py:113-142).

Structural: the exact parameter count/shape inventory of RealESRGAN_x4plus
(16,697,987 params) and 4x output geometry. Numerical: forward parity at
atol 1e-4 against a torch transcription of basicsr's RRDBNet through the
state-dict converter (basicsr itself is not installed in this container)."""

import numpy as np

import jax
import jax.numpy as jnp

from nicediffusion_tpu.models.rrdb import RRDBNet, convert_esrgan_state_dict


def test_param_count_matches_realesrgan_x4plus():
    net = RRDBNet()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    )["params"]
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    # RRDBNet(3, 3, 64, 23, 32): the published RealESRGAN_x4plus size
    assert n == 16_697_987, n


def test_forward_4x_and_residual_scaling():
    net = RRDBNet(num_block=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_convert_esrgan_state_dict_structure():
    """basicsr-style names map onto the flax tree and transpose OIHW->HWIO."""
    sd = {
        "conv_first.weight": np.zeros((64, 3, 3, 3), dtype=np.float32),
        "conv_first.bias": np.zeros((64,), dtype=np.float32),
        "body.0.rdb1.conv1.weight": np.zeros((32, 64, 3, 3), dtype=np.float32),
        "body.0.rdb1.conv1.bias": np.zeros((32,), dtype=np.float32),
        "conv_last.weight": np.zeros((3, 64, 3, 3), dtype=np.float32),
        "conv_last.bias": np.zeros((3,), dtype=np.float32),
    }
    params = convert_esrgan_state_dict(sd)
    assert params["conv_first"]["kernel"].shape == (3, 3, 3, 64)
    assert params["body_0"]["rdb1"]["conv1"]["kernel"].shape == (3, 3, 64, 32)
    assert params["conv_last"]["kernel"].shape == (3, 3, 64, 3)


# ---------------------------------------------------------------------------
# Numerical golden vs a torch transcription of basicsr's RRDBNet
# (VERDICT r1 #6). basicsr is not installed in this container, so the torch
# side is a faithful transcription of basicsr.archs.rrdbnet_arch (scale-4
# path): dense blocks with LeakyReLU(0.2) and 0.2 residual scaling, RRDB of
# three chained RDBs, nearest-2x upsampling convs. State-dict names match
# basicsr (body.{i}.rdb{j}.conv{k}) so convert_esrgan_state_dict is
# exercised exactly as it would be on RealESRGAN_x4plus.pth['params_ema'].
# ---------------------------------------------------------------------------

import torch
import torch.nn as tnn
import torch.nn.functional as F


class _TorchRDB(tnn.Module):
    def __init__(self, num_feat, num_grow_ch):
        super().__init__()
        nf, gc = num_feat, num_grow_ch
        self.conv1 = tnn.Conv2d(nf, gc, 3, 1, 1)
        self.conv2 = tnn.Conv2d(nf + gc, gc, 3, 1, 1)
        self.conv3 = tnn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
        self.conv4 = tnn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
        self.conv5 = tnn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)
        self.lrelu = tnn.LeakyReLU(negative_slope=0.2, inplace=True)

    def forward(self, x):
        x1 = self.lrelu(self.conv1(x))
        x2 = self.lrelu(self.conv2(torch.cat((x, x1), 1)))
        x3 = self.lrelu(self.conv3(torch.cat((x, x1, x2), 1)))
        x4 = self.lrelu(self.conv4(torch.cat((x, x1, x2, x3), 1)))
        x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
        return x5 * 0.2 + x


class _TorchRRDB(tnn.Module):
    def __init__(self, num_feat, num_grow_ch):
        super().__init__()
        self.rdb1 = _TorchRDB(num_feat, num_grow_ch)
        self.rdb2 = _TorchRDB(num_feat, num_grow_ch)
        self.rdb3 = _TorchRDB(num_feat, num_grow_ch)

    def forward(self, x):
        out = self.rdb1(x)
        out = self.rdb2(out)
        out = self.rdb3(out)
        return out * 0.2 + x


class _TorchRRDBNet(tnn.Module):
    def __init__(self, num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23,
                 num_grow_ch=32):
        super().__init__()
        self.conv_first = tnn.Conv2d(num_in_ch, num_feat, 3, 1, 1)
        self.body = tnn.Sequential(
            *[_TorchRRDB(num_feat, num_grow_ch) for _ in range(num_block)]
        )
        self.conv_body = tnn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up1 = tnn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up2 = tnn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_hr = tnn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_last = tnn.Conv2d(num_feat, num_out_ch, 3, 1, 1)
        self.lrelu = tnn.LeakyReLU(negative_slope=0.2, inplace=True)

    def forward(self, x):
        feat = self.conv_first(x)
        body_feat = self.conv_body(self.body(feat))
        feat = feat + body_feat
        feat = self.lrelu(
            self.conv_up1(F.interpolate(feat, scale_factor=2, mode="nearest"))
        )
        feat = self.lrelu(
            self.conv_up2(F.interpolate(feat, scale_factor=2, mode="nearest"))
        )
        return self.conv_last(self.lrelu(self.conv_hr(feat)))


def test_rrdb_numerical_parity_vs_torch(rng_np):
    torch.manual_seed(0)
    tnet = _TorchRRDBNet(
        num_in_ch=3, num_out_ch=3, num_feat=32, num_block=2, num_grow_ch=16
    ).eval()

    net = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=32, num_block=2,
                  num_grow_ch=16)
    params = convert_esrgan_state_dict(tnet.state_dict())

    x = torch.tensor(rng_np.uniform(size=(2, 3, 12, 12)).astype(np.float32))
    with torch.no_grad():
        ref = tnet(x).numpy()
    out = net.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )
