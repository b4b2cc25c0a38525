"""Environment behavior tests: reset/step API, determinism, rewards, dones,
constraints, disturbances, goal-horizon obs, vmapped batch stepping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make

QUAD_TASK_INFO = {'stabilization_goal': [0, 1],
                  'stabilization_goal_tolerance': 0.05}


def test_cartpole_seed_determinism():
    env1 = make('cartpole', seed=42)
    env2 = make('cartpole', seed=42)
    o1, _ = env1.reset(seed=42)
    o2, _ = env2.reset(seed=42)
    assert np.allclose(o1, o2)
    a = np.array([3.0])
    s1 = [env1.step(a)[0] for _ in range(5)]
    s2 = [env2.step(a)[0] for _ in range(5)]
    assert np.allclose(np.array(s1), np.array(s2))


def test_cartpole_goal_reached_done_at_goal():
    # Stabilization episodes starting exactly at the goal terminate
    # immediately via goal_reached (cartpole.py:660-663 semantics).
    env = make('cartpole', seed=0, randomized_init=False)
    env.reset()
    obs, rew, done, info = env.step(np.zeros(1))
    assert done


def test_cartpole_reward_and_time_limit():
    env = make('cartpole', seed=0, randomized_init=False, episode_len_sec=1,
               ctrl_freq=10, pyb_freq=100, task='traj_tracking',
               done_on_out_of_bound=False)
    obs, _ = env.reset()
    assert np.allclose(obs, 0.0, atol=1e-6)
    done = False
    steps = 0
    while not done:
        obs, rew, done, info = env.step(np.zeros(1))
        steps += 1
        assert 0.0 <= rew <= 1.0  # exponential RL reward bounded
    assert steps == 10
    assert info.get('TimeLimit.truncated', False) is True


def test_cartpole_out_of_bound_terminates():
    env = make('cartpole', seed=0, randomized_init=False,
               init_state={'init_x': 2.39}, episode_len_sec=5)
    env.reset()
    done = False
    for _ in range(100):
        obs, rew, done, info = env.step(np.array([10.0]))
        if done:
            break
    assert done
    assert info['out_of_bounds']


def test_cartpole_quadratic_cost_tracking():
    env = make('cartpole', seed=0, cost='quadratic', task='traj_tracking',
               randomized_init=False)
    obs, info = env.reset()
    assert env.X_GOAL.ndim == 2
    obs, rew, done, info = env.step(np.zeros(1))
    assert rew <= 0.0  # negative quadratic cost


def test_cartpole_constraints_in_info():
    cons = [{'constraint_form': 'default_constraint',
             'constrained_variable': 'state'}]
    env = make('cartpole', seed=0, constraints=cons, randomized_init=False)
    env.reset()
    obs, rew, done, info = env.step(np.zeros(1))
    assert 'constraint_values' in info
    assert info['constraint_values'].shape == (8,)
    assert info['constraint_violation'] == 0


def test_cartpole_constraint_violation_done():
    cons = [{'constraint_form': 'bounded_constraint',
             'constrained_variable': 'state',
             'active_dims': [0],
             'lower_bounds': [-0.01], 'upper_bounds': [0.01]}]
    env = make('cartpole', seed=0, constraints=cons, done_on_violation=True,
               randomized_init=False, init_state={'init_x': 0.0})
    env.reset()
    done = False
    for _ in range(50):
        obs, rew, done, info = env.step(np.array([10.0]))
        if done:
            break
    assert done
    assert info['constraint_violation'] == 1


def test_cartpole_obs_goal_horizon():
    env = make('cartpole', seed=0, task='traj_tracking', cost='rl_reward',
               obs_goal_horizon=2, randomized_init=False)
    obs, _ = env.reset()
    assert obs.shape == (4 + 2 * 4,)
    obs, *_ = env.step(np.zeros(1))
    assert obs.shape == (4 + 2 * 4,)


def test_cartpole_action_disturbance_white_noise():
    dist = {'action': [{'disturbance_func': 'white_noise', 'std': 0.5}]}
    env = make('cartpole', seed=1, disturbances=dist, randomized_init=False)
    env.reset()
    obs, rew, done, info = env.step(np.zeros(1))
    # noisy physical action differs from commanded zero
    assert abs(env.current_noisy_physical_action[0]) > 0


def test_cartpole_normalized_action_space():
    env = make('cartpole', seed=0, normalized_rl_action_space=True,
               randomized_init=False)
    env.reset()
    assert env.action_space.high[0] == 1
    env.step(np.array([0.5]))
    assert np.allclose(env.current_physical_action, [5.0])


@pytest.mark.parametrize('quad_type,nx,nu', [(1, 2, 1), (2, 6, 2), (3, 12, 4)])
def test_quadrotor_shapes(quad_type, nx, nu):
    ti = dict(QUAD_TASK_INFO)
    if quad_type == 3:
        ti['stabilization_goal'] = [0, 0, 1]
    env = make('quadrotor', seed=0, quad_type=quad_type, task_info=ti,
               randomized_init=False)
    obs, _ = env.reset()
    assert obs.shape == (nx,)
    assert env.action_space.shape == (nu,)
    obs, rew, done, info = env.step(env.U_GOAL)
    assert obs.shape == (nx,)


def test_quadrotor_hover_is_stable():
    # Goal away from the start so goal_reached doesn't end the episode.
    ti = {'stabilization_goal': [1, 1.5], 'stabilization_goal_tolerance': 0.01}
    env = make('quadrotor', seed=0, quad_type=2, task_info=ti,
               randomized_init=False, init_state={'init_z': 1.0})
    obs, _ = env.reset()
    for _ in range(20):
        obs, rew, done, info = env.step(env.U_GOAL)
    # Still hovering near start point after 20 steps of exact hover thrust.
    assert abs(obs[2] - 1.0) < 1e-2
    assert abs(obs[0]) < 1e-3
    assert not done


def test_quadrotor_normalized_action():
    env = make('quadrotor', seed=0, quad_type=2, task_info=QUAD_TASK_INFO,
               normalized_rl_action_space=True, randomized_init=False,
               init_state={'init_z': 1.0})
    env.reset()
    env.step(np.zeros(2))  # 0 normalized = hover thrust
    assert np.allclose(env.current_physical_action, env.hover_thrust, rtol=1e-5)


def test_vmapped_batch_stepping():
    env = make('cartpole', seed=0)
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.vmap(env.func.reset)(keys)
    assert obs.shape == (B, 4)
    actions = jnp.zeros((B, 1))
    states, out = jax.vmap(env.func.step)(states, actions)
    assert out.obs.shape == (B, 4)
    assert out.reward.shape == (B,)
    # Batched envs differ (randomized init).
    assert float(jnp.std(out.obs[:, 0])) > 0


def test_adversary_disturbance_changes_outcome():
    env = make('cartpole', seed=0, adversary_disturbance='dynamics',
               randomized_init=False)
    env.reset()
    o_clean, *_ = env.step(np.zeros(1))
    env.reset()
    env.set_adversary_control(np.array([1.0, 1.0]))
    o_adv, *_ = env.step(np.zeros(1))
    assert not np.allclose(o_clean, o_adv)


def test_action_space_seeded_deterministically():
    """Same env seed => same action_space.sample() stream; different seed
    => different stream (reference seeds env AND spaces,
    benchmark_env.py:193-214). Regression: spaces are created by the
    subclass AFTER __init__'s seed() ran, so _build_functional must seed
    them — an unseeded space made GP-MPC/MPSC training data depend on
    process-global entropy."""
    draws = lambda e: np.stack([e.action_space.sample() for _ in range(6)])
    a = draws(make('cartpole', seed=7))
    b = draws(make('cartpole', seed=7))
    c = draws(make('cartpole', seed=8))
    q1 = draws(make('quadrotor', quad_type=2, seed=7))
    q2 = draws(make('quadrotor', quad_type=2, seed=7))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(q1, q2)
