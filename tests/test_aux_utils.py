"""sim2real deployment, TensorPID, normal/face-id render, collision images."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def test_numpy_policy_matches_jax(tmp_path):
    """export_policy_npz + NumpyPolicy reproduce the jax actor exactly."""
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer
    from aerial_gym_simulator_tpu.sim2real import NumpyPolicy, export_policy_npz

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    cfg = PPOConfig(num_envs=8, horizon=4, minibatch_size=32, seed=0)
    trainer = PPOTrainer(task, cfg)
    ckpt = str(tmp_path / "p.ckpt")
    trainer.save_checkpoint(ckpt)
    npz = str(tmp_path / "p.npz")
    export_policy_npz(ckpt, npz)
    policy = NumpyPolicy(npz)

    obs = np.random.RandomState(3).randn(5, 13).astype(np.float32)
    a_np = policy(obs)
    a_jax = np.asarray(trainer.act(jnp.asarray(obs), deterministic=True))
    np.testing.assert_allclose(a_np, a_jax, atol=1e-5)


def test_numpy_recurrent_export_matches_jax(tmp_path):
    """A natively-trained GRU checkpoint exports to the recurrent archive
    and NumpyRecurrentPolicy reproduces trainer.act() exactly across steps,
    including zeroing per-env hidden at episode boundaries."""
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer
    from aerial_gym_simulator_tpu.sim2real import (NumpyRecurrentPolicy,
                                                   export_policy_npz,
                                                   load_policy_npz)

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    cfg = PPOConfig(num_envs=8, horizon=4, minibatch_size=32, seed=0,
                    rnn="gru", rnn_hidden=16, hidden=(32, 16))
    trainer = PPOTrainer(task, cfg)
    ckpt = str(tmp_path / "g.ckpt")
    trainer.save_checkpoint(ckpt)
    npz = str(tmp_path / "g.npz")
    export_policy_npz(ckpt, npz)
    policy = load_policy_npz(npz, num_envs=5)
    assert isinstance(policy, NumpyRecurrentPolicy)
    assert policy.recurrent and policy.action_dim == 4

    rng = np.random.RandomState(7)
    dones = None
    for t in range(6):
        obs = rng.randn(5, 13).astype(np.float32)
        a_jax = np.asarray(trainer.act(jnp.asarray(obs), deterministic=True,
                                       done_prev=dones))
        if dones is not None:
            policy.reset(np.nonzero(dones)[0])
        a_np = policy(obs)
        np.testing.assert_allclose(a_np, a_jax, atol=1e-5,
                                   err_msg=f"step {t}")
        dones = (rng.rand(5) < 0.3).astype(np.float32)


def test_torchscript_export_matches_numpy_policy(tmp_path):
    """convert_model_to_script_model produces a self-contained scripted
    module whose outputs match NumpyPolicy, and whose rescale_actions
    matches the reference's convert_model.py mapping."""
    torch = pytest.importorskip("torch")
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer
    from aerial_gym_simulator_tpu.sim2real import (
        NumpyPolicy, convert_model_to_script_model, export_policy_npz)

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    trainer = PPOTrainer(task, PPOConfig(num_envs=8, horizon=4,
                                         minibatch_size=32, seed=0))
    ckpt = str(tmp_path / "p.ckpt")
    trainer.save_checkpoint(ckpt)
    npz = str(tmp_path / "p.npz")
    export_policy_npz(ckpt, npz)
    pt = convert_model_to_script_model(npz, str(tmp_path / "p.pt"),
                                       action_limit_min=[0.2] * 4,
                                       action_limit_max=[1.2] * 4)
    m = torch.jit.load(pt)
    obs = np.random.RandomState(3).randn(5, 13).astype(np.float32)
    a_script = m(torch.from_numpy(obs.copy())).detach().numpy()
    a_np = NumpyPolicy(npz)(obs)
    np.testing.assert_allclose(a_script, a_np, atol=1e-5)
    # rescale: 0 -> mid-range, +/-1 -> limits (convert_model.py:29-33)
    r = m.rescale_actions(torch.tensor([[0.0, 1.0, -1.0, 0.0]])).numpy()[0]
    np.testing.assert_allclose(r, [0.7, 1.2, 0.2, 0.7], atol=1e-6)


def test_torchscript_export_recurrent_matches_numpy_policy(tmp_path):
    """Recurrent (GRU) archives script to an explicit-hidden-state module
    that tracks NumpyRecurrentPolicy across steps and resets."""
    torch = pytest.importorskip("torch")
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer
    from aerial_gym_simulator_tpu.sim2real import (
        convert_model_to_script_model, export_policy_npz, load_policy_npz)

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    trainer = PPOTrainer(task, PPOConfig(num_envs=8, horizon=4,
                                         minibatch_size=32, seed=0,
                                         rnn="gru", rnn_hidden=16,
                                         hidden=(32, 16)))
    ckpt = str(tmp_path / "g.ckpt")
    trainer.save_checkpoint(ckpt)
    npz = str(tmp_path / "g.npz")
    export_policy_npz(ckpt, npz)
    pt = convert_model_to_script_model(npz, str(tmp_path / "g.pt"))
    m = torch.jit.load(pt)
    ref_policy = load_policy_npz(npz, num_envs=5)

    rng = np.random.RandomState(7)
    h = m.initial_state(5)
    for t in range(6):
        obs = rng.randn(5, 13).astype(np.float32)
        a_script, h = m(torch.from_numpy(obs.copy()), h)
        a_np = ref_policy(obs)
        np.testing.assert_allclose(a_script.detach().numpy(), a_np,
                                   atol=1e-5, err_msg=f"step {t}")
        # zero a random env's hidden like an episode reset
        if t == 2:
            ref_policy.reset([1])
            h = h.clone()
            h[1] = 0.0


def test_sim2real_inference_class(tmp_path):
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer
    from aerial_gym_simulator_tpu.sim2real import Sim2RealInferenceClass

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=4,
                                      seed=0)
    trainer = PPOTrainer(task, PPOConfig(num_envs=4, horizon=4,
                                         minibatch_size=16, seed=0))
    ckpt = str(tmp_path / "c.ckpt")
    trainer.save_checkpoint(ckpt)
    inf = Sim2RealInferenceClass(num_envs=1, num_actions=4, num_obs=13,
                                 checkpoint_path=ckpt)
    a = inf.get_action(np.zeros((1, 13), np.float32))
    assert a.shape == (1, 4)
    a0 = inf.get_action(np.zeros((13,), np.float32), get_robot_zero=True)
    assert a0.shape == (4,)


def test_tensor_pid_converges():
    """PID drives a first-order plant to the setpoint (reference
    utils/tensor_pid.py semantics: anti-windup + D-term reset skip)."""
    from aerial_gym_simulator_tpu.utils.tensor_pid import TensorPID

    pid = TensorPID(num_envs=4, num_dims=2, Kp=2.0, Kd=0.1, Ki=0.5, dt=0.02,
                    integral_min_limit=-1.0, integral_max_limit=1.0,
                    derivative_saturation_min_limit=-10.0,
                    derivative_saturation_max_limit=10.0,
                    output_min_limit=-5.0, output_max_limit=5.0)
    st = pid.init_state()
    x = jnp.zeros((4, 2))
    target = jnp.ones((4, 2)) * 0.7
    for _ in range(400):
        st, u = pid.update(st, target - x)
        x = x + 0.02 * (u - 0.5 * x)   # plant: dx = u - 0.5x
    np.testing.assert_allclose(np.asarray(x), 0.7, atol=0.05)

    st = pid.reset_idx(st, jnp.array([1.0, 0.0, 0.0, 0.0]))
    assert float(st.integral[0].sum()) == 0.0
    assert float(st.integral[1].sum()) != 0.0


@pytest.fixture(scope="module")
def obstacle_env():
    return SimBuilder().build_env("base_sim", "env_with_obstacles",
                                  "base_quadrotor_with_camera",
                                  "lee_velocity_control", num_envs=2, seed=0)


def test_normal_faceid_camera(obstacle_env):
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        render_normal_faceid_camera,
    )
    env = obstacle_env
    env.reset()
    depth, normals, face, seg = render_normal_faceid_camera(env.params,
                                                            env.state)
    N = 2
    H, W = env.params.camera.height, env.params.camera.width
    assert depth.shape == (N, H, W)
    assert normals.shape == (N, H, W, 3)
    assert face.shape == (N, H, W)
    hit = np.asarray(depth) < 900.0
    assert hit.any(), "no hits in obstacle env"
    n = np.asarray(normals)[hit]
    norms = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert (np.asarray(face)[hit] >= 0).all()
    assert (np.asarray(face)[~hit] == -1).all()


def test_collision_image_inflation(obstacle_env):
    """Inflated render returns closer depths than the raw render."""
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import render_camera
    from aerial_gym_simulator_tpu.utils.collision_image_generator import (
        render_inflated_depth,
    )
    env = obstacle_env
    env.reset()
    # raw depth, unnormalized comparison: use the normal/faceid path which
    # returns raw depths
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        render_normal_faceid_camera,
    )
    raw_depth, *_ = render_normal_faceid_camera(env.params, env.state)
    infl_depth, _ = render_inflated_depth(env.params, env.state,
                                          inflation_radius=0.3)
    raw = np.asarray(raw_depth)
    infl = np.asarray(infl_depth)
    hit_both = (raw < 900) & (infl < 900)
    assert hit_both.any()
    # inflation can only bring surfaces closer (or create new hits)
    assert (infl[hit_both] <= raw[hit_both] + 1e-3).all()
    assert (infl < 900).sum() >= (raw < 900).sum()


def test_bem_standalone_matches_momentum_balance():
    """examples/bem_standalone.py (reference bem_standalone.ipynb parity):
    hover thrust balances momentum theory at the solved induced velocity,
    and spin direction flips lateral force / drag-torque signs."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import bem_standalone as bem

    bp = bem.default_params()
    force, torque = bem.bem_rotor_wrench(bp, 2000.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    force = np.asarray(force); torque = np.asarray(torque)
    # oracle values from an independent scipy/fsolve solve of the paper
    # equations at the notebook's example condition (omega=2000, hover)
    np.testing.assert_allclose(force[2], -7.44396, rtol=1e-4)
    np.testing.assert_allclose(torque[2], 0.101683, rtol=1e-4)
    # the induced-velocity fixed point balances momentum theory against
    # blade-element thrust (both evaluated at zero flapping, eq. 5 vs 13)
    v_i = bem._solve_induced_velocity(bp, 2000.0, 0.0, 0.0)
    t_mom = bem._momentum_thrust(bp, v_i, 0.0, 0.0)
    t_bet, _, _ = bem._bet_integrals(bp, 2000.0, 0.0, 0.0, v_i,
                                     0.0, 0.0, 0.0)
    np.testing.assert_allclose(float(t_bet) / float(t_mom), 1.0, rtol=5e-3)
    # counter-clockwise flips the aerodynamic torque sign
    _, torque_ccw = bem.bem_rotor_wrench(bp, 2000.0, 0.0, 0.0, 0.0, 0.0, -1.0)
    np.testing.assert_allclose(np.asarray(torque_ccw)[2], -torque[2], rtol=1e-5)


def _make_rl_games_ckpt(path, obs_dim=13, act_dim=4):
    import torch
    g = torch.Generator().manual_seed(3)
    dims = [obs_dim, 32, 16, act_dim]
    sd = {}
    for j, i in enumerate((0, 2)):
        sd[f"a2c_network.actor_mlp.{i}.weight"] = torch.randn(
            dims[j + 1], dims[j], generator=g)
        sd[f"a2c_network.actor_mlp.{i}.bias"] = torch.randn(
            dims[j + 1], generator=g)
    sd["a2c_network.mu.weight"] = torch.randn(act_dim, 16, generator=g)
    sd["a2c_network.mu.bias"] = torch.randn(act_dim, generator=g)
    sd["a2c_network.sigma"] = torch.zeros(act_dim)
    sd["running_mean_std.running_mean"] = torch.randn(obs_dim, generator=g)
    sd["running_mean_std.running_var"] = torch.rand(obs_dim, generator=g) + 0.5
    torch.save({"model": sd}, path)
    return sd


def test_import_rl_games_policy_matches_torch(tmp_path):
    """torch_import (migration from reference rl_games_example networks):
    converted NumpyPolicy reproduces the torch actor forward exactly."""
    import torch
    import torch.nn.functional as F
    from aerial_gym_simulator_tpu.sim2real import (NumpyPolicy,
                                                   import_rl_games_policy)

    pth = str(tmp_path / "p.pth"); npz = str(tmp_path / "p.npz")
    sd = _make_rl_games_ckpt(pth)
    import_rl_games_policy(pth, npz)
    pol = NumpyPolicy(npz)

    x = np.random.RandomState(0).randn(6, 13).astype(np.float32)
    t = (torch.tensor(x) - sd["running_mean_std.running_mean"]) / torch.sqrt(
        sd["running_mean_std.running_var"] + 1e-5)
    t = torch.clamp(t, -5, 5).float()
    with torch.no_grad():
        for i in (0, 2):
            t = F.elu(F.linear(t, sd[f"a2c_network.actor_mlp.{i}.weight"],
                               sd[f"a2c_network.actor_mlp.{i}.bias"]))
        mu = F.linear(t, sd["a2c_network.mu.weight"],
                      sd["a2c_network.mu.bias"])
    np.testing.assert_allclose(pol(x), mu.numpy(), rtol=1e-5, atol=1e-4)


def test_import_sample_factory_policy_matches_torch_gru(tmp_path):
    """Recurrent sample-factory import: numpy GRU matches torch.nn.GRU
    across carried steps, and reset() zeroes selected env states."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from aerial_gym_simulator_tpu.sim2real import (
        NumpyRecurrentPolicy, import_sample_factory_policy)

    obs_dim, hid, act = 9, 8, 4
    g = torch.Generator().manual_seed(5)
    sd = {
        "encoder.encoders.obs.mlp_head.0.weight": torch.randn(hid, obs_dim, generator=g),
        "encoder.encoders.obs.mlp_head.0.bias": torch.randn(hid, generator=g),
        "core.core.weight_ih_l0": torch.randn(3 * hid, hid, generator=g),
        "core.core.weight_hh_l0": torch.randn(3 * hid, hid, generator=g),
        "core.core.bias_ih_l0": torch.randn(3 * hid, generator=g),
        "core.core.bias_hh_l0": torch.randn(3 * hid, generator=g),
        "action_parameterization.distribution_linear.weight":
            torch.randn(2 * act, hid, generator=g),
        "action_parameterization.distribution_linear.bias":
            torch.randn(2 * act, generator=g),
    }
    pth = str(tmp_path / "sf.pth"); npz = str(tmp_path / "sf.npz")
    torch.save({"model": sd}, pth)
    import_sample_factory_policy(pth, npz)
    pol = NumpyRecurrentPolicy(npz, num_envs=3)
    assert pol.action_dim == act and pol.recurrent

    gru = nn.GRU(hid, hid)
    gru.weight_ih_l0.data = sd["core.core.weight_ih_l0"]
    gru.weight_hh_l0.data = sd["core.core.weight_hh_l0"]
    gru.bias_ih_l0.data = sd["core.core.bias_ih_l0"]
    gru.bias_hh_l0.data = sd["core.core.bias_hh_l0"]

    obs = np.random.RandomState(2).randn(3, obs_dim).astype(np.float32)
    h = torch.zeros(1, 3, hid)
    with torch.no_grad():
        enc = F.elu(F.linear(torch.tensor(obs),
                             sd["encoder.encoders.obs.mlp_head.0.weight"],
                             sd["encoder.encoders.obs.mlp_head.0.bias"]))
        for step in range(3):
            out, h = gru(enc[None], h)
            mu = F.linear(out[0],
                          sd["action_parameterization.distribution_linear.weight"],
                          sd["action_parameterization.distribution_linear.bias"]
                          )[:, :act]
            np.testing.assert_allclose(pol(obs), mu.numpy(), atol=2e-5)
    # selective reset: env 1 state zeroed -> matches a fresh policy's step-1
    pol.reset([1])
    fresh = NumpyRecurrentPolicy(npz, num_envs=3)
    np.testing.assert_allclose(pol(obs)[1], fresh(obs)[1], atol=2e-5)


def test_torchscript_export_imported_rl_games_archive(tmp_path):
    """The TorchScript exporter accepts rl-games-imported archives (W*
    layout, norm_eps=1e-5) and matches the validated NumpyPolicy."""
    import torch
    from aerial_gym_simulator_tpu.sim2real import (NumpyPolicy,
                                                   import_rl_games_policy)
    from aerial_gym_simulator_tpu.sim2real.torch_export import (
        convert_model_to_script_model)

    pth = str(tmp_path / "p.pth"); npz = str(tmp_path / "p.npz")
    _make_rl_games_ckpt(pth)
    import_rl_games_policy(pth, npz)
    pt = convert_model_to_script_model(npz, str(tmp_path / "p.pt"))
    m = torch.jit.load(pt)
    x = np.random.RandomState(1).randn(6, 13).astype(np.float32)
    np.testing.assert_allclose(m(torch.from_numpy(x.copy())).detach().numpy(),
                               NumpyPolicy(npz)(x), atol=1e-5, rtol=1e-5)
    # limits must come in pairs
    with pytest.raises(ValueError, match="BOTH"):
        convert_model_to_script_model(npz, str(tmp_path / "q.pt"),
                                      action_limit_min=[0.0] * 4)


def test_torchscript_export_imported_sample_factory_gru(tmp_path):
    """The TorchScript exporter accepts sample-factory-imported recurrent
    archives and tracks NumpyRecurrentPolicy across carried steps."""
    import torch
    from aerial_gym_simulator_tpu.sim2real import (
        NumpyRecurrentPolicy, import_sample_factory_policy)
    from aerial_gym_simulator_tpu.sim2real.torch_export import (
        convert_model_to_script_model)

    obs_dim, hid, act = 9, 8, 4
    g = torch.Generator().manual_seed(6)
    sd = {
        "encoder.encoders.obs.mlp_head.0.weight": torch.randn(hid, obs_dim, generator=g),
        "encoder.encoders.obs.mlp_head.0.bias": torch.randn(hid, generator=g),
        "core.core.weight_ih_l0": torch.randn(3 * hid, hid, generator=g),
        "core.core.weight_hh_l0": torch.randn(3 * hid, hid, generator=g),
        "core.core.bias_ih_l0": torch.randn(3 * hid, generator=g),
        "core.core.bias_hh_l0": torch.randn(3 * hid, generator=g),
        "action_parameterization.distribution_linear.weight":
            torch.randn(2 * act, hid, generator=g),
        "action_parameterization.distribution_linear.bias":
            torch.randn(2 * act, generator=g),
    }
    pth = str(tmp_path / "sf.pth"); npz = str(tmp_path / "sf.npz")
    torch.save({"model": sd}, pth)
    import_sample_factory_policy(pth, npz)
    pol = NumpyRecurrentPolicy(npz, num_envs=3)
    pt = convert_model_to_script_model(npz, str(tmp_path / "sf.pt"))
    m = torch.jit.load(pt)
    h = m.initial_state(3)
    obs = np.random.RandomState(4).randn(3, obs_dim).astype(np.float32)
    for step in range(3):
        a_script, h = m(torch.from_numpy(obs.copy()), h)
        np.testing.assert_allclose(a_script.detach().numpy(), pol(obs),
                                   atol=2e-5, err_msg=f"step {step}")


def test_sysid_fit_time_constants_recovers_tau():
    """sys_id --fit (reference motorid notebook workflow): recover the
    asymmetric first-order time constants from a synthetic step trace."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import sys_id

    tau_up, tau_down = 0.04, 0.02
    dt = 0.001
    t_up = np.arange(0, 0.4, dt)
    y_up = 2.0 * (1 - np.exp(-t_up / tau_up))
    t_dn = np.arange(0, 0.4, dt) + t_up[-1] + dt
    y_dn = y_up[-1] * np.exp(-(t_dn - t_dn[0]) / tau_down)
    times = np.concatenate([t_up, t_dn])
    thrusts = np.concatenate([y_up, y_dn])
    ti, td = sys_id.fit_time_constants(times, thrusts)
    np.testing.assert_allclose(ti, tau_up, rtol=0.1)
    np.testing.assert_allclose(td, tau_down, rtol=0.1)


def test_imu_csv_reader_and_sim2real_config():
    """imu_to_rosbag CSV reader parses logged rows (ROS-free part) and the
    deployment dimension constants match the navigation obs layout."""
    from aerial_gym_simulator_tpu.utils.imu_to_rosbag import read_imu_csv
    from aerial_gym_simulator_tpu.sim2real import config as s2r_cfg

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        f.write("t,ax,ay,az,gx,gy,gz\n0.0,0,0,9.81,0,0,0\n0.01,0.1,0,9.8,0,0,0.01\n")
        path = f.name
    rows = list(read_imu_csv(path))
    assert len(rows) == 2 and rows[1][0] == 0.01 and rows[0][3] == 9.81

    assert s2r_cfg.TOTAL_IP_DIMS == 17
    assert s2r_cfg.TOTAL_OBS_DIMS == 81   # == navigation_task obs dim
