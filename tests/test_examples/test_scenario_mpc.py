"""Scenario/adaptive robust MPC demo (examples/mpc/scenario_mpc_demo.py).

Pins the three claims: (a) the parametric scenario solve reproduces the
plain MPC exactly when given the nominal parameters, (b) multiple-model
adaptation identifies the true plant from closed-loop data, (c) the
adaptive controller beats the nominal-prior MPC by a wide margin under
heavy model mismatch."""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'examples', 'mpc'))

from safe_control_gym_tpu.utils.registration import make


def test_scenario_solve_matches_plain_mpc():
    import jax.numpy as jnp
    from scenario_mpc_demo import (NOMINAL_LENGTH, TASK,
                                   ScenarioCartpoleMPC)
    from safe_control_gym_tpu.envs.dynamics import CartPoleParams
    env_func = partial(make, 'cartpole', **TASK)
    kw = dict(q_mpc=[5, 0.1, 5, 0.1], r_mpc=[0.1], horizon=10,
              warmstart=True, sqp_iters=2)
    obs = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
    prior = {'prior_prop': {'pole_length': NOMINAL_LENGTH}}

    plain = make('mpc', env_func, prior_info=prior, **kw)
    plain.reset()
    u_plain = plain.select_action(obs, None)
    plain.close()

    ctrl = ScenarioCartpoleMPC(env_func, prior_info=prior, **kw)
    ctrl.reset()
    n = 3
    scen = CartPoleParams(
        pole_length=jnp.asarray([NOMINAL_LENGTH, 0.7, 0.9], jnp.float32),
        pole_mass=jnp.full((n,), 0.1, jnp.float32),
        cart_mass=jnp.full((n,), 1.0, jnp.float32),
        gravity=jnp.full((n,), 9.8, jnp.float32))
    cands, feas = ctrl.select_action_scenarios(obs, scen)
    assert feas.all()
    np.testing.assert_allclose(cands[0], np.atleast_1d(u_plain), atol=1e-4)
    # Different models, different plans.
    assert abs(float(cands[2] - cands[0])) > 1e-3
    ctrl.close()


def test_adaptive_scenario_mpc_identifies_and_improves():
    from scenario_mpc_demo import TRUE_LENGTH, run
    cost_nom, cost_scen, identified = run(n_scenarios=8, verbose=False)
    assert abs(identified - TRUE_LENGTH) < 0.05, identified
    assert cost_scen < cost_nom / 3.0, (cost_nom, cost_scen)
