"""Scenario (domain-randomized) robust NMPC in one device call.

The reference cannot express this: every model variant would be its own
IPOPT process. Here ``MPC.select_action_scenarios`` solves the SAME
receding-horizon problem under B sampled dynamics parameter sets as one
vmapped XLA program (the parametric-dynamics hook threads the scenario's
``CartPoleParams`` pytree through the jitted SQP solve), and a minimax
consensus rule picks the action planned for the most pessimistic model.

Demo task: cartpole stabilization where the TRUE pole is much longer than
the nominal prior (effective length 0.9 m vs 0.5 m). The nominal-prior
MPC plans with the wrong model. The scenario controller runs
multiple-model adaptive control (MMAC): every scenario's MPC plans in
parallel, each real transition re-scores the scenarios by one-step
prediction error, and the best-matching model's action is applied — the
controller identifies the plant online and converges to the matched-model
policy, all in one vmapped solve + one vmapped prediction per step.

Usage: python examples/mpc/scenario_mpc_demo.py [--n_scenarios 16]
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from safe_control_gym_tpu.controllers.mpc.mpc import MPC
from safe_control_gym_tpu.envs.dynamics import (CartPoleParams,
                                                cartpole_dynamics, rk4_step)
from safe_control_gym_tpu.utils.registration import make

TRUE_LENGTH = 0.9          # effective (half) pole length of the real plant
NOMINAL_LENGTH = 0.5       # what the nominal prior believes

TASK = dict(seed=42, cost='quadratic', ctrl_freq=15, pyb_freq=750,
            episode_len_sec=6, randomized_init=False,
            init_state={'init_theta': 0.15},
            task_info={'stabilization_goal': [0.0],
                       'stabilization_goal_tolerance': 0.0},
            inertial_prop={'pole_length': TRUE_LENGTH},
            done_on_out_of_bound=False,
            constraints=[{'constraint_form': 'default_constraint',
                          'constrained_variable': 'input'}])


class ScenarioCartpoleMPC(MPC):
    """MPC whose prior dynamics take the scenario's CartPoleParams as a
    runtime pytree argument (the ``dynamics_func_param`` hook — same
    machinery online GP-MPC uses to update data without recompiling)."""

    def dynamics_func_param(self, x, u, p):
        return rk4_step(cartpole_dynamics, x, u, self.dt, p)


def sample_scenarios(n, low=0.4, high=1.0, seed=0):
    lengths = np.random.default_rng(seed).uniform(low, high, n)
    lengths[0] = NOMINAL_LENGTH            # always include the nominal
    return CartPoleParams(
        pole_length=jnp.asarray(lengths, jnp.float32),
        pole_mass=jnp.full((n,), 0.1, jnp.float32),
        cart_mass=jnp.full((n,), 1.0, jnp.float32),
        gravity=jnp.full((n,), 9.8, jnp.float32))


class AdaptiveScenarioPolicy:
    """Multiple-model adaptive control over the scenario set: apply the
    action of the scenario whose dynamics best explain the observed
    transitions (exponentially discounted one-step prediction error)."""

    def __init__(self, ctrl, scenarios, n, forget=0.9):
        self.ctrl, self.scenarios, self.n = ctrl, scenarios, n
        self.forget = forget
        self.err = np.zeros(n)
        self.prev = None          # (x, u) of the last applied transition
        self._pred_v = jax.jit(jax.vmap(
            lambda x, u, j: rk4_step(
                cartpole_dynamics, x, u, ctrl.dt,
                jax.tree.map(lambda l: l[j], scenarios)),
            in_axes=(None, None, 0)))

    def __call__(self, obs):
        x = np.asarray(obs, np.float32)[:self.ctrl.model.nx]
        if self.prev is not None:
            xp, up = self.prev
            preds = np.asarray(self._pred_v(jnp.asarray(xp),
                                            jnp.asarray(up),
                                            jnp.arange(self.n)))
            step_err = np.linalg.norm(preds - x[None], axis=1)
            self.err = self.forget * self.err + step_err
        cands, feas = self.ctrl.select_action_scenarios(x, self.scenarios)
        score = np.where(feas, self.err, np.inf)
        u = cands[int(np.argmin(score))]
        self.prev = (x, np.atleast_1d(np.asarray(u, np.float32)))
        return u

    @property
    def identified_length(self):
        j = int(np.argmin(self.err))
        return float(np.asarray(self.scenarios.pole_length)[j])


def run_episode(env_func, action_fn):
    env = env_func()
    obs, _ = env.reset()
    done, costs = False, []
    while not done:
        obs, rew, done, info = env.step(action_fn(obs))
        costs.append(-rew)
    env.close()
    return float(np.mean(costs))


def run(n_scenarios=16, verbose=True):
    env_func = partial(make, 'cartpole', **TASK)
    # DARE terminal cost: without it a 1 s horizon is myopic about the x
    # drift of the slow long-pole plant for EVERY prior, drowning the
    # robustness comparison in horizon effects.
    mpc_kw = dict(q_mpc=[5, 0.1, 5, 0.1], r_mpc=[0.1], horizon=15,
                  warmstart=True, sqp_iters=2,
                  use_lqr_gain_and_terminal_cost=True)

    nominal = make('mpc', env_func,
                   prior_info={'prior_prop': {'pole_length': NOMINAL_LENGTH}},
                   **mpc_kw)
    nominal.reset()
    cost_nom = run_episode(env_func,
                           lambda o: nominal.select_action(o, None))
    nominal.close()

    ctrl = ScenarioCartpoleMPC(
        env_func, prior_info={'prior_prop': {'pole_length': NOMINAL_LENGTH}},
        **mpc_kw)
    ctrl.reset()
    scen = sample_scenarios(n_scenarios)
    policy = AdaptiveScenarioPolicy(ctrl, scen, n_scenarios)
    t0 = time.perf_counter()
    cost_scen = run_episode(env_func, policy)
    dt = time.perf_counter() - t0
    ctrl.close()

    if verbose:
        print(f'true pole length {TRUE_LENGTH} m, nominal prior '
              f'{NOMINAL_LENGTH} m, {n_scenarios} scenarios')
        print(f'nominal-prior MPC        mean stage cost: {cost_nom:.4f}')
        print(f'adaptive scenario MPC    mean stage cost: {cost_scen:.4f} '
              f'({dt:.1f} s closed loop)')
        print(f'identified pole length: {policy.identified_length:.3f} m '
              f'(true {TRUE_LENGTH})')
        print(f'improvement: {cost_nom / cost_scen:.2f}x')
    return cost_nom, cost_scen, policy.identified_length


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_scenarios', type=int, default=16)
    args = ap.parse_args()
    run(n_scenarios=args.n_scenarios)
