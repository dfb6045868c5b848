"""Depth-image VAE training (reference utils/vae trained checkpoint analog).

The reference ships a pre-trained 64-latent depth VAE used as a frozen
perception backbone in the navigation task. This script trains the same
architecture directly on depth renders from the simulator itself: random
robot poses in the obstacle environment produce an endless on-device data
stream, so the whole pipeline (render -> VAE update) runs on the TPU with
no dataset on disk.

    python -m aerial_gym_simulator_tpu.models.train_vae \
        --steps 2000 --batch 64 --out /tmp/depth_vae_params.pkl

Use the result via NavigationTaskConfig.vae_params_path.
"""

from __future__ import annotations

import argparse
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..sensors.raycast_sensor import render_camera
from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..utils.logging import CustomLogger
from .vae import DepthVAE, vae_loss

logger = CustomLogger("train_vae")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--latent_dim", type=int, default=64)
    p.add_argument("--image_h", type=int, default=135,
                   help="training resolution (navigation uses 270x480 "
                        "inputs resized to this)")
    p.add_argument("--image_w", type=int, default=240)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kld_beta", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--collision_targets", action="store_true",
                   help="deep-collision-encoder mode: encode raw depth but "
                        "reconstruct the robot-radius-INFLATED depth "
                        "(reference dce_rl_navigation / "
                        "collision_image_generator training recipe)")
    p.add_argument("--out", default="/tmp/depth_vae_params.pkl")
    p.add_argument("--arch", choices=["conv", "vit"], default="conv",
                   help="encoder architecture: the reference-parity conv "
                        "VAE, or the ViT transformer encoder (models/vit; "
                        "MXU-friendly, tensor-parallel shardable)")
    p.add_argument("--vit_dim", type=int, default=128,
                   help="ViT embed dim (--arch vit); raise for MXU-scale "
                        "backbones (the nav task rebuilds from the pickle "
                        "tags, so any size deploys unchanged)")
    p.add_argument("--vit_depth", type=int, default=4)
    p.add_argument("--vit_heads", type=int, default=4)
    p.add_argument("--vit_attn", choices=["xla", "fused", "flash"],
                   default="xla",
                   help="attention implementation (--arch vit): 'fused' "
                        "routes through the in-repo short-seq Pallas "
                        "kernel (ops/attention_pallas.py — the fast and "
                        "memory-lean choice at ViT sequence lengths); "
                        "'flash' routes through jax's flash-attention "
                        "kernel (same checkpoint format; measured slower "
                        "than both at seq 225 AND OOMs at the training "
                        "batch — kept for benchmarking, see scripts/"
                        "vit_attention_bench.py)")
    p.add_argument("--vit_remat", action="store_true",
                   help="rematerialize transformer blocks in the backward "
                        "(jax.checkpoint): the memory lever for LARGE "
                        "encoders — dim-512/depth-12 at batch 1024 OOMs "
                        "without it under every attention impl and "
                        "trains with it (param tree unchanged)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend before first device use (the axon TPU plugin ignores JAX_PLATFORMS=cpu; this flag is the reliable CPU-run switch)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    env = SimBuilder().build_env(
        "base_sim", "env_with_obstacles", "base_quadrotor_with_camera",
        "lee_velocity_control", num_envs=args.batch, seed=args.seed)
    env.reset()
    params_sim = env.params
    H, W = args.image_h, args.image_w

    if args.arch == "vit":
        from .vit import DepthViT
        model = DepthViT(latent_dim=args.latent_dim, out_hw=(H, W),
                         dim=args.vit_dim, depth=args.vit_depth,
                         num_heads=args.vit_heads, attn_impl=args.vit_attn,
                         remat=args.vit_remat)
    else:
        model = DepthVAE(latent_dim=args.latent_dim, out_hw=(H, W))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    vparams = model.init(init_key, jnp.zeros((1, H, W, 1)), init_key)
    tx = optax.adam(args.lr)
    opt_state = tx.init(vparams)

    def sample_batch(state, key):
        """Teleport robots to random poses and render fresh depth images.

        Returns (state, inputs, targets): targets == inputs for plain depth
        reconstruction, or the robot-radius-inflated depth when training a
        deep collision encoder (the latent then predicts where the robot
        FITS rather than raw geometry)."""
        k1, k2 = jax.random.split(key)
        state = dynamics.reset_envs(params_sim, state,
                                    jnp.ones((args.batch,)))
        pixels, _ = render_camera(params_sim, state, noise_key=k1)

        def to_img(px):
            img = jax.image.resize(px[..., None], (args.batch, H, W, 1),
                                   "nearest")
            return jnp.clip(img, 0.0, 1.0)

        inputs = to_img(pixels)
        if args.collision_targets:
            from ..utils.collision_image_generator import render_inflated_depth
            infl, _ = render_inflated_depth(params_sim, state)
            infl = jnp.clip(infl / float(params_sim.camera.max_range), 0.0, 1.0)
            targets = to_img(infl)
        else:
            targets = inputs
        return state, inputs, targets

    @jax.jit
    def train_step(vparams, opt_state, state, key):
        key, k_data, k_vae = jax.random.split(key, 3)
        state, batch, targets = sample_batch(state, k_data)
        (loss, (bce, kld)), grads = jax.value_and_grad(
            lambda p: vae_loss(model, p, batch, k_vae, args.kld_beta,
                               targets=targets),
            has_aux=True)(vparams)
        updates, opt_state = tx.update(grads, opt_state)
        vparams = optax.apply_updates(vparams, updates)
        return vparams, opt_state, state, key, loss, bce, kld

    state = env.state
    t0 = time.perf_counter()
    for it in range(args.steps):
        vparams, opt_state, state, key, loss, bce, kld = train_step(
            vparams, opt_state, state, key)
        if it % 100 == 0 or it == args.steps - 1:
            logger.info(f"it {it:5d} loss {float(loss):.5f} "
                        f"bce {float(bce):.5f} kld {float(kld):.4f} "
                        f"wall {time.perf_counter() - t0:.1f}s")

    with open(args.out, "wb") as f:
        if args.arch == "vit":
            # arch-tagged (+ model hyperparameters) so the navigation task
            # rebuilds the exact encoder skeleton
            pickle.dump({"arch": "vit", "params": jax.device_get(vparams),
                         "patch": tuple(model.patch), "dim": model.dim,
                         "depth": model.depth,
                         "num_heads": model.num_heads,
                         "attn_impl": model.attn_impl}, f)
        else:
            pickle.dump(jax.device_get(vparams), f)
    logger.info(f"saved {args.arch} VAE params to {args.out}")
    return args.out


if __name__ == "__main__":
    main()
