"""Statistical pinning of the STOCHASTIC whole-rollout kernel mode — the
mode every ``BENCH_r*.json`` headline row actually runs (on-core PRNG
actions / Gaussian action noise / randomized auto-resets,
``ops/rollout_kernels.py``) — against the production per-step scan path
(``FuncEnv.step_autoreset``) under the identical env configuration.

The replay mode (fixed actions, deterministic resets) is bit-equivalence
tested on the CPU interpreter (tests/test_rollout_kernel.py); the
stochastic mode cannot run there (``pltpu.prng_seed`` has no CPU
lowering), so these tests require the real chip:

    SCG_TPU_TESTS=1 python -m pytest tests/test_kernel_stochastic_tpu.py -q

Under the default suite (CPU backend) every test self-skips. Coverage:

  * raw-generator moments: ``_uniform01`` and the Box-Muller
    ``_standard_normal`` against their theoretical moments AND the JAX
    PRNG's empirical moments at the same sample size;
  * episode-statistic equivalence: per-env done/reward/violation RATES
    from the stochastic kernel vs the per-step scan under the exact
    ``bench.py`` configurations (plain and constraints+disturbances),
    compared with a Welch z-test across the 4096-env sample.

Reference protocol being pinned: README.md:169-193 (the headline
benchmark the reference publishes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

# Sample sizes. B matches bench.py's operating point. T must be EQUAL on
# the two paths: the per-env rate variance scales ~1/T (CLT over steps),
# so both the Welch standard errors and the variance-ratio check are only
# comparable at the same rollout length.
B = 4096
T_KERNEL = 1024
T_SCAN = 1024


def _require_tpu():
    if jax.default_backend() == 'cpu':
        pytest.skip('stochastic kernel mode needs the real TPU '
                    '(run with SCG_TPU_TESTS=1)')


def _welch(a, b, z=6.0, label=''):
    """Two-sample Welch z-test: means of iid per-env samples ``a`` (kernel)
    and ``b`` (scan) must agree within ``z`` combined standard errors."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    se = np.sqrt(a.var() / a.size + b.var() / b.size)
    diff = abs(a.mean() - b.mean())
    assert diff <= z * se + 1e-9, \
        (f'{label}: kernel mean {a.mean():.6g} vs scan mean {b.mean():.6g} '
         f'(|diff| {diff:.3g} > {z} x se {se:.3g})')
    # Second moment: catch a generator with the right mean but wrong
    # spread (e.g. a scaling bug in the on-core uniform->float mapping).
    va, vb = a.var(), b.var()
    if min(va, vb) > 1e-12:
        ratio = va / vb
        assert 0.5 < ratio < 2.0, \
            f'{label}: variance ratio kernel/scan {ratio:.3f} outside [0.5, 2]'


# ---------------------------------------------------------------------------
# Raw generator moments
# ---------------------------------------------------------------------------

def _draw_kernel(kind, rows=256, cols=2048, seed=17):
    """(rows, cols) samples from the kernel's on-core generators."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from safe_control_gym_tpu.ops import rollout_kernels as rk

    def kern(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        if kind == 'uniform':
            o_ref[:] = rk._uniform01(o_ref.shape)
        else:
            u1 = rk._uniform01(o_ref.shape)
            u2 = rk._uniform01(o_ref.shape)
            o_ref[:] = rk._standard_normal(u1, u2)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rows, cols), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
    )(jnp.asarray([seed], jnp.int32))
    return np.asarray(out, np.float64).ravel()


def test_uniform01_moments():
    """_uniform01 (high-24-bit int cast, rollout_kernels.py:68-75) matches
    U[0,1) theory and the JAX PRNG at the same sample size."""
    _require_tpu()
    s = _draw_kernel('uniform')
    n = s.size
    assert s.min() >= 0.0 and s.max() < 1.0
    # Theory: mean 1/2 (se = sqrt(1/12/n)), var 1/12.
    assert abs(s.mean() - 0.5) < 6 * np.sqrt(1 / 12 / n)
    assert abs(s.var() - 1 / 12) < 6 * np.sqrt(1 / 180 / n)  # var of (U-.5)^2
    # Median split and quartiles: catches a biased bit-mapping with the
    # right first two moments.
    for q, frac in ((0.25, 0.25), (0.5, 0.5), (0.75, 0.75)):
        p = (s < q).mean()
        assert abs(p - frac) < 6 * np.sqrt(frac * (1 - frac) / n), (q, p)
    # Against the JAX PRNG empirically (same n, Welch).
    j = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (n,)),
                   np.float64)
    _welch(s, j, label='uniform01 vs jax.random.uniform')


def test_box_muller_moments():
    """Box-Muller _standard_normal (rollout_kernels.py:78-81) matches N(0,1)
    theory and the JAX PRNG: first four moments + tail mass."""
    _require_tpu()
    s = _draw_kernel('normal')
    n = s.size
    assert abs(s.mean()) < 6 / np.sqrt(n)
    assert abs(s.var() - 1.0) < 6 * np.sqrt(2 / n)
    # Skewness (se ~ sqrt(6/n)) and excess kurtosis (se ~ sqrt(24/n)).
    sk = ((s - s.mean()) ** 3).mean() / s.std() ** 3
    ku = ((s - s.mean()) ** 4).mean() / s.std() ** 4 - 3.0
    assert abs(sk) < 6 * np.sqrt(6 / n), sk
    assert abs(ku) < 6 * np.sqrt(24 / n), ku
    # Two-sided 5% tail.
    tail = (np.abs(s) > 1.959964).mean()
    assert abs(tail - 0.05) < 6 * np.sqrt(0.05 * 0.95 / n), tail
    j = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (n,)),
                   np.float64)
    _welch(s, j, label='box-muller vs jax.random.normal')


# ---------------------------------------------------------------------------
# Episode-statistic equivalence: stochastic kernel vs per-step scan
# ---------------------------------------------------------------------------

def _scan_rates(env, key, T):
    """Per-env (done, reward, violation) PER-STEP rates from the production
    per-step path under the bench protocol (hoisted uniform actions, iid
    reset keys — benchmark_suite.measure_batched's rollout)."""
    func = env.func
    lo = jnp.asarray(env.action_space.low, jnp.float32)
    hi = jnp.asarray(env.action_space.high, jnp.float32)
    k_act, k_reset, k0 = jax.random.split(key, 3)
    counts_violations = env.constraints is not None \
        and bool(env.constraints.constraints)

    @jax.jit
    def run():
        actions = jax.random.uniform(k_act, (T, B, func.act_dim),
                                     minval=lo, maxval=hi)
        reset_keys = jax.random.split(k_reset, T)
        states, _ = func.reset_batch(k0, B)
        z = jnp.zeros((B,), jnp.float32)

        def body(carry, xs):
            st, rew, dn, vi = carry
            a, kr = xs
            st, out, _obs = func.step_autoreset(st, a, kr)
            if counts_violations:
                vi = vi + out.constraint_violation.astype(jnp.float32)
            return (st, rew + out.reward,
                    dn + out.done.astype(jnp.float32), vi), None

        (_, rew, dn, vi), _ = jax.lax.scan(
            body, (states, z, z, z), (actions, reset_keys))
        return rew / T, dn / T, vi / T

    return tuple(np.asarray(x) for x in run())


def _kernel_rates(env, system, constrained, seed, T):
    """Per-env per-step rates from the stochastic whole-rollout kernel —
    exactly the ``measure_rollout_kernel`` invocation bench.py times."""
    from safe_control_gym_tpu.ops import rollout_kernels as rk
    cfg_fn, roll_fn, cidx = {
        'cartpole': (rk.cartpole_rollout_cfg, rk.cartpole_rollout_pallas,
                     rk._C),
        'quadrotor': (rk.quad2d_rollout_cfg, rk.quad2d_rollout_pallas,
                      rk._Q),
        'quadrotor_3D': (rk.quad3d_rollout_cfg, rk.quad3d_rollout_pallas,
                         rk._Q),
    }[system]
    cfg = cfg_fn(env)
    if constrained:
        std = float(jnp.atleast_1d(
            env.disturbances['action'].disturbances[0].std)[0])
        cfg = cfg.at[cidx['NOISE_STD']].set(std)
    states, _ = jax.jit(lambda k: env.func.reset_batch(k, B))(
        jax.random.PRNGKey(0))
    out = roll_fn(states.state, cfg, seed, n_steps=T,
                  n_substeps=env.PYB_STEPS_PER_CTRL, dt=env.PYB_TIMESTEP,
                  draw_actions=True, constrained=constrained,
                  randomized_reset=bool(env.RANDOMIZED_INIT))
    return (np.asarray(out['reward_sum']) / T,
            np.asarray(out['done_count']) / T,
            np.asarray(out['violation_count']) / T)


def test_policy_eval_kernel_vs_scan_stats():
    """The closed-loop policy-in-kernel path (the bench CLOSED-LOOP rows:
    stochastic actor MLP in-kernel) is distribution-equivalent to the
    per-step-scan path through the SAME public API
    (``evaluate_policy_fused``): per-env episode statistics agree under a
    Welch z-test. Stochastic mode makes the comparison robust to the
    paths' different matmul precisions (exploration std ~0.6 dominates)
    and is exactly what ``measure_closed_loop_kernel`` times."""
    _require_tpu()
    from functools import partial

    from safe_control_gym_tpu.experiments.fused_eval import \
        evaluate_policy_fused
    from safe_control_gym_tpu.utils.registration import get_config, make
    env_func = partial(make, 'cartpole', seed=7,
                       normalized_rl_action_space=True)
    ctrl = make('ppo', env_func, output_dir='/tmp/fused_eval_tpu', seed=0,
                **get_config('ppo'))
    try:
        kw = dict(batch=B, n_steps=T_KERNEL, stochastic=True,
                  return_per_env=True)
        rk = evaluate_policy_fused(ctrl, seed=11, use_kernel=True, **kw)
        rs = evaluate_policy_fused(ctrl, seed=23, use_kernel=False, **kw)
        assert rk['path'] == 'policy-in-kernel'
        assert rs['path'] == 'per-step-scan'
        assert rk['episodes'] > 0 and rs['episodes'] > 0
        _welch(rk['per_env']['reward_sum'], rs['per_env']['reward_sum'],
               label='policy eval reward_sum')
        _welch(rk['per_env']['done_count'], rs['per_env']['done_count'],
               label='policy eval done_count')
    finally:
        ctrl.close()


@pytest.mark.parametrize('system,constrained', [
    ('cartpole', False),
    ('cartpole', True),
    ('quadrotor', True),
    ('quadrotor_3D', True),
])
def test_stochastic_rollout_episode_stats(system, constrained):
    """The stochastic kernel's per-env episode statistics are
    distribution-equivalent to the production per-step scan under the
    exact bench.py env configuration (Welch z-test over 4096 envs)."""
    _require_tpu()
    from safe_control_gym_tpu.experiments.benchmark_suite import _env_kwargs
    from safe_control_gym_tpu.utils.registration import make
    env = make(system.replace('_3D', ''), **_env_kwargs(system, constrained))
    try:
        k_rew, k_dn, k_vi = _kernel_rates(env, system, constrained,
                                          seed=11, T=T_KERNEL)
        s_rew, s_dn, s_vi = _scan_rates(env, jax.random.PRNGKey(23), T_SCAN)
        tag = f'{system} constrained={constrained}'
        assert k_dn.mean() > 0, f'{tag}: kernel saw no episode ends'
        _welch(k_rew, s_rew, label=f'{tag} reward/step')
        _welch(k_dn, s_dn, label=f'{tag} dones/step')
        if constrained:
            assert k_vi.mean() > 0, f'{tag}: kernel saw no violations'
            _welch(k_vi, s_vi, label=f'{tag} violations/step')
    finally:
        env.close()
