"""Torch VAE weight import (reference utils/vae/VAE.py migration path).

Builds a torch model with the reference VAE's exact architecture (from the
documented layer spec), converts its random weights, and checks the flax
parity modules reproduce the torch forward passes to float32 precision.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from aerial_gym_simulator_tpu.models.torch_vae_import import (  # noqa: E402
    TorchParityDecoder, TorchParityEncoder, convert_torch_vae_state_dict,
    load_torch_vae)


class _RefEncoder(nn.Module):
    """Same layer spec as reference ImgEncoder (VAE.py define_encoder)."""

    def __init__(self, latent=64):
        super().__init__()
        self.conv0 = nn.Conv2d(1, 32, 5, 2, 2)
        self.conv0_1 = nn.Conv2d(32, 32, 3, 2, 2)
        self.conv1_0 = nn.Conv2d(32, 32, 5, 2, 1)
        self.conv1_1 = nn.Conv2d(32, 64, 3, 1, 1)
        self.conv0_jump_2 = nn.Conv2d(32, 64, 4, 2, 1)
        self.conv2_0 = nn.Conv2d(64, 64, 5, 2, 2)
        self.conv2_1 = nn.Conv2d(64, 128, 3, 2, 1)
        self.conv1_jump_3 = nn.Conv2d(64, 128, 5, 4, (2, 1))
        self.conv3_0 = nn.Conv2d(128, 128, 5, 2)
        self.dense0 = nn.Linear(3 * 6 * 128, 512)
        self.dense1 = nn.Linear(512, 2 * latent)
        self.elu = nn.ELU()

    def forward(self, img):
        x0_1 = self.elu(self.conv0_1(self.conv0(img)))
        x1_1 = self.elu(self.conv1_1(self.conv1_0(x0_1))
                        + self.conv0_jump_2(x0_1))
        x2_1 = self.elu(self.conv2_1(self.conv2_0(x1_1))
                        + self.conv1_jump_3(x1_1))
        x = self.conv3_0(x2_1).reshape(img.shape[0], -1)
        return self.dense1(self.elu(self.dense0(x)))


class _RefDecoder(nn.Module):
    """Same layer spec as reference ImgDecoder."""

    def __init__(self):
        super().__init__()
        self.dense = nn.Linear(64, 512)
        self.dense1 = nn.Linear(512, 9 * 15 * 128)
        self.deconv1 = nn.ConvTranspose2d(128, 128, 3, 1, 1)
        self.deconv2 = nn.ConvTranspose2d(128, 64, 5, 2, (2, 2),
                                          output_padding=(0, 1))
        self.deconv4 = nn.ConvTranspose2d(64, 32, 6, 4, (2, 2),
                                          output_padding=(0, 0))
        self.deconv6 = nn.ConvTranspose2d(32, 16, 6, 2, (0, 0),
                                          output_padding=(0, 1))
        self.deconv7 = nn.ConvTranspose2d(16, 1, 4, 2, 2)

    def forward(self, z):
        x = torch.relu(self.dense(z))
        x = self.dense1(x).view(z.shape[0], 128, 9, 15)
        x = torch.relu(self.deconv1(x))
        x = torch.relu(self.deconv2(x))
        x = torch.relu(self.deconv4(x))
        x = torch.relu(self.deconv6(x))
        return torch.sigmoid(self.deconv7(x))


@pytest.fixture(scope="module")
def torch_vae_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    enc, dec = _RefEncoder(), _RefDecoder()
    # the reference VAE's actual attribute names (VAE.py:177-178:
    # self.encoder / self.img_decoder), with a "module." wrapper on some
    # keys like raw DataParallel training checkpoints have
    sd = {f"module.encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"img_decoder.{k}": v for k, v in dec.state_dict().items()})
    path = str(tmp_path_factory.mktemp("vae") / "vae.pth")
    torch.save(sd, path)
    return enc, dec, sd, path


def test_encoder_matches_torch(torch_vae_ckpt):
    enc, _dec, sd, _path = torch_vae_ckpt
    ep, _dp = convert_torch_vae_state_dict(sd)
    x = np.random.RandomState(0).rand(2, 270, 480).astype(np.float32)
    with torch.no_grad():
        t_out = enc(torch.tensor(x)[:, None]).numpy()
    j_out = np.asarray(TorchParityEncoder().apply(ep,
                                                  jnp.asarray(x)[..., None]))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4)


def test_decoder_matches_torch(torch_vae_ckpt):
    _enc, dec, sd, _path = torch_vae_ckpt
    _ep, dp = convert_torch_vae_state_dict(sd)
    z = np.random.RandomState(1).randn(2, 64).astype(np.float32)
    with torch.no_grad():
        t_img = dec(torch.tensor(z)).numpy()          # (B, 1, 270, 480)
    j_img = np.asarray(TorchParityDecoder().apply(dp, jnp.asarray(z)))
    assert j_img.shape == (2, 270, 480, 1)
    np.testing.assert_allclose(j_img[..., 0], t_img[:, 0], atol=1e-5)


def test_image_encoder_wrapper_loads_pth(torch_vae_ckpt):
    enc, _dec, _sd, path = torch_vae_ckpt
    from aerial_gym_simulator_tpu.models.torch_vae_import import (
        TorchVAEImageEncoder)
    vae = TorchVAEImageEncoder(path)
    # renders at the task resolution (135x240) are upsampled to 270x480,
    # like the reference vae_image_encoder interpolation
    img = np.random.RandomState(2).rand(3, 135, 240).astype(np.float32)
    lat = np.asarray(vae.encode(jnp.asarray(img)))
    assert lat.shape == (3, 64)
    up = torch.nn.functional.interpolate(torch.tensor(img)[:, None],
                                         size=(270, 480), mode="nearest")
    with torch.no_grad():
        t_lat = enc(up).numpy()[:, :64]
    np.testing.assert_allclose(lat, t_lat, atol=1e-4)
    rec = np.asarray(vae.decode(jnp.asarray(lat)))
    assert rec.shape == (3, 270, 480, 1)
