"""Depth-VAE training pipeline smoke (CPU-sized)."""

import pickle

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.models.train_vae import main as train_vae_main
from aerial_gym_simulator_tpu.models.vae import VAEImageEncoder


def test_train_vae_pipeline(tmp_path):
    out = str(tmp_path / "vae.pkl")
    train_vae_main(["--steps", "3", "--batch", "2", "--image_h", "48",
                    "--image_w", "64", "--out", out])
    with open(out, "rb") as f:
        params = pickle.load(f)
    enc = VAEImageEncoder(latent_dim=64, image_res=(48, 64), params=params)
    lat = enc.encode(jnp.zeros((2, 48, 64)))
    assert lat.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(lat)))


def test_train_vae_collision_targets(tmp_path):
    out = str(tmp_path / "dce.pkl")
    train_vae_main(["--steps", "2", "--batch", "2", "--image_h", "48",
                    "--image_w", "64", "--collision_targets", "--out", out])
    with open(out, "rb") as f:
        params = pickle.load(f)
    assert params is not None
