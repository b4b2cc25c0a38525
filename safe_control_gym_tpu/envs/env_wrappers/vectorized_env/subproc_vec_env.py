"""Subprocess vec env — parity with
envs/env_wrappers/vectorized_env/subproc_vec_env.py (251 LoC reference).

N envs split over ``n_workers`` spawn-context processes with pipe commands
(step / reset / get_attr / set_attr / env_method / get/set_random_state) and
worker auto-reset with terminal stash. Provided for API parity and for
host-bound workloads; the TPU-native path is
:class:`~safe_control_gym_tpu.envs.env_wrappers.vectorized_env.jax_vec_env.JaxVecEnv`
(one fused vmapped program, no processes, no pipes).
"""

from __future__ import annotations

import multiprocessing as mp

import cloudpickle
import numpy as np

from safe_control_gym_tpu.envs.env_wrappers.vectorized_env.vec_env import \
    VecEnv

__all__ = ['SubprocVecEnv']


class CloudpickleWrapper:
    """Serialize contents with cloudpickle (vec_env_utils parity)."""

    def __init__(self, x):
        self.x = x

    def __getstate__(self):
        return cloudpickle.dumps(self.x)

    def __setstate__(self, ob):
        self.x = cloudpickle.loads(ob)


def _worker(remote, parent_remote, env_fn_wrappers):
    """Worker loop (subproc_vec_env.py:186-251)."""
    parent_remote.close()
    # Workers must not grab the TPU; force CPU before the first jax use.
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    envs = [fn() for fn in env_fn_wrappers.x]
    try:
        while True:
            cmd, data = remote.recv()
            if cmd == 'step':
                results = []
                for env, action in zip(envs, data):
                    obs, rew, done, info = env.step(action)
                    if done:
                        info['terminal_observation'] = obs
                        info['terminal_info'] = dict(info)
                        obs, _ = env.reset()
                    results.append((obs, rew, done, info))
                remote.send(results)
            elif cmd == 'reset':
                remote.send([env.reset()[0] for env in envs])
            elif cmd == 'close':
                remote.close()
                break
            elif cmd == 'get_spaces_spec':
                remote.send((envs[0].observation_space,
                             envs[0].action_space))
            elif cmd == 'get_attr':
                remote.send([getattr(env, data) for env in envs])
            elif cmd == 'set_attr':
                name, value = data
                for env in envs:
                    setattr(env, name, value)
                remote.send(None)
            elif cmd == 'env_method':
                name, args, kwargs = data
                remote.send([getattr(env, name)(*args, **kwargs)
                             for env in envs])
            elif cmd == 'get_random_state':
                remote.send([np.asarray(env._key) for env in envs])
            elif cmd == 'set_random_state':
                import jax.numpy as jnp
                for env, s in zip(envs, data):
                    env._key = jnp.asarray(s)
                remote.send(None)
            else:
                raise NotImplementedError(f'Unknown command {cmd}')
    except KeyboardInterrupt:
        pass
    finally:
        for env in envs:
            env.close()


class SubprocVecEnv(VecEnv):
    """Multiprocess vectorized environment."""

    def __init__(self, env_fns, n_workers: int = 2, context: str = 'spawn'):
        self.waiting = False
        self.closed = False
        n_envs = len(env_fns)
        if n_envs % n_workers != 0:
            raise ValueError('Number of envs must be divisible by number of workers.')
        env_fns_chunks = np.array_split(env_fns, n_workers)
        ctx = mp.get_context(context)
        self.remotes, self.work_remotes = zip(
            *[ctx.Pipe() for _ in range(n_workers)])
        self.ps = []
        for work_remote, remote, fns in zip(self.work_remotes, self.remotes,
                                            env_fns_chunks):
            p = ctx.Process(target=_worker,
                            args=(work_remote, remote,
                                  CloudpickleWrapper(list(fns))),
                            daemon=True)
            p.start()
            self.ps.append(p)
        for remote in self.work_remotes:
            remote.close()
        self.n_workers = n_workers
        self.envs_per_worker = n_envs // n_workers
        self.remotes[0].send(('get_spaces_spec', None))
        observation_space, action_space = self.remotes[0].recv()
        super().__init__(n_envs, observation_space, action_space)

    def step_async(self, actions):
        assert not self.waiting
        for remote, chunk in zip(self.remotes,
                                 np.array_split(actions, self.n_workers)):
            remote.send(('step', chunk))
        self.waiting = True

    def step_wait(self):
        assert self.waiting
        results = []
        for remote in self.remotes:
            results.extend(remote.recv())
        self.waiting = False
        obs, rews, dones, infos = zip(*results)
        return (np.stack(obs), np.asarray(rews), np.asarray(dones),
                list(infos))

    def reset(self):
        for remote in self.remotes:
            remote.send(('reset', None))
        obs = []
        for remote in self.remotes:
            obs.extend(remote.recv())
        return np.stack(obs)

    def close_extras(self):
        if self.waiting:
            for remote in self.remotes:
                remote.recv()
        for remote in self.remotes:
            remote.send(('close', None))
        for p in self.ps:
            p.join()

    def _dispatch(self, cmd, data=None):
        for remote in self.remotes:
            remote.send((cmd, data))
        out = []
        for remote in self.remotes:
            r = remote.recv()
            if isinstance(r, list):
                out.extend(r)
            else:
                out.append(r)
        return out

    def get_attr(self, attr_name, indices=None):
        return self._dispatch('get_attr', attr_name)

    def set_attr(self, attr_name, values, indices=None):
        return self._dispatch('set_attr', (attr_name, values))

    def env_method(self, method_name, method_args=None, method_kwargs=None,
                   indices=None):
        return self._dispatch('env_method', (method_name, method_args or [],
                                             method_kwargs or {}))

    def get_images(self):
        return self._dispatch('env_method', ('render', [], {}))

    def get_env_random_state(self):
        return self._dispatch('get_random_state')

    def set_env_random_state(self, worker_random_states):
        for remote, chunk in zip(
                self.remotes,
                np.array_split(worker_random_states, self.n_workers)):
            remote.send(('set_random_state', list(chunk)))
        for remote in self.remotes:
            remote.recv()
