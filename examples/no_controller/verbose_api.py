"""Verbose API tour — parity with examples/no_controller/verbose_api.py:
17-80: prints the full analytic/symbolic API surface of an env."""

from functools import partial

import numpy as np

from safe_control_gym_tpu.utils.configuration import ConfigFactory
from safe_control_gym_tpu.utils.registration import make


def run():
    CONFIG_FACTORY = ConfigFactory()
    config = CONFIG_FACTORY.merge()

    env_func = partial(make, config.task, **config.task_config)
    env = env_func()
    obs, info = env.reset()

    print('OBSERVATION SPACE:', env.observation_space)
    print('ACTION SPACE:', env.action_space)
    print('STATE SPACE:', env.state_space)
    print('PHYSICAL ACTION BOUNDS:', env.physical_action_bounds)
    print('X_GOAL shape:', np.shape(env.X_GOAL))
    print('U_GOAL:', env.U_GOAL)

    model = env.symbolic
    print('\n--- ANALYTIC (symbolic-equivalent) MODEL ---')
    print('nx, nu, ny:', model.nx, model.nu, model.ny)
    print('dt:', model.dt)
    x = np.zeros(model.nx)
    u = np.atleast_1d(env.U_GOAL)[:model.nu] if np.ndim(env.U_GOAL) else np.zeros(model.nu)
    u = np.asarray(u, dtype=np.float32).reshape(model.nu)
    print('fc_func(x0, u0):', np.asarray(model.fc_func(x, u)))
    print('fd_func(x0, u0):', np.asarray(model.fd_func(x, u)))
    df = model.df_func(x, u)
    print('dfdx:\n', np.asarray(df['dfdx']))
    print('dfdu:\n', np.asarray(df['dfdu']))
    loss = model.loss(x=x, u=u, Xr=np.zeros(model.nx),
                      Ur=np.zeros(model.nu), Q=np.eye(model.nx),
                      R=np.eye(model.nu))
    print('loss l:', float(np.asarray(loss['l'])))
    print('loss l_x:', np.asarray(loss['l_x']))

    if env.constraints is not None:
        print('\n--- CONSTRAINTS ---')
        print('num_constraints:', env.constraints.num_constraints)
        print('values at reset:', env.constraints.get_values(env, only_state=True))

    print('\n--- STEP OUTPUT ---')
    obs, reward, done, step_info = env.step(u)
    print('obs:', obs)
    print('reward:', reward)
    print('done:', done)
    print('info:', step_info)
    env.close()


if __name__ == '__main__':
    run()
