"""BenchmarkEnv — TPU-native task-environment protocol.

Functional rebuild of the reference's ``BenchmarkEnv`` (envs/benchmark_env.py:
42-780). The reference is a mutable ``gym.Env`` whose step crosses into
PyBullet C++ ~``pyb_freq/ctrl_freq`` times per control step; here the entire
control step — action pipeline, physics substeps, disturbances, reward, done,
constraint evaluation, counters — is ONE pure jitted function over an explicit
``EnvState`` pytree:

    step_fn : (EnvState, action) -> (EnvState', StepOut)

Batched simulation ("VecEnv") is then just ``jax.vmap(step_fn)`` and scaling
across TPU chips is ``shard_map`` over the batch axis — no subprocess workers
or pipes (cf. reference subproc_vec_env.py).

A thin stateful shim (this class, still a ``gym.Env``) preserves the
reference's mutable API surface — ``reset()/step()`` returning numpy + info
dicts, ``env.state``, ``current_*_action`` bookkeeping (benchmark_env.py:
331-334), ``X_GOAL/U_GOAL``, ``env.symbolic`` — so controllers and the
experiment harness read identically to the reference.

Key semantic parity points (each noted where implemented):
* timing: ``PYB_FREQ % CTRL_FREQ == 0``, substeps per control step
  (benchmark_env.py:138-148);
* ``before_step`` squeeze/1-D check (:400-420); action pipeline
  raw -> physical -> noisy -> clipped (:331-334, cartpole.py:479-502);
* ``after_step``: constraint eval once per step, violation -> done/penalty,
  TimeLimit truncation (:447-502);
* ``extend_obs`` goal-horizon augmentation (:422-445);
* trajectory / stabilization references (:504-713, cartpole.py:215-233);
* domain randomization via {distrib, args, kwargs} specs (:237-268).
"""

from __future__ import annotations

import copy
from enum import Enum
from typing import Any, Callable, Dict, Optional

import gymnasium as gym
from gymnasium import spaces
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from safe_control_gym_tpu.envs import constraints as constraints_mod
from safe_control_gym_tpu.envs import disturbances as disturbances_mod
from safe_control_gym_tpu.envs.trajectories import generate_trajectory

__all__ = ['Task', 'Cost', 'Environment', 'EnvState', 'StepOut', 'BenchmarkEnv']


class Task(str, Enum):
    """Environment tasks (benchmark_env.py:30-35)."""
    STABILIZATION = 'stabilization'
    TRAJ_TRACKING = 'traj_tracking'


class Cost(str, Enum):
    """Reward/cost functions (benchmark_env.py:21-27)."""
    RL_REWARD = 'rl_reward'
    QUADRATIC = 'quadratic'


class Environment(str, Enum):
    """Implemented environments (benchmark_env.py:37-39)."""
    CARTPOLE = 'cartpole'
    QUADROTOR = 'quadrotor'


@struct.dataclass
class EnvState:
    """Complete per-episode simulation state (a pytree; vmappable)."""
    state: jax.Array          # physical state vector
    ctrl_step: jax.Array      # i32 control-step counter
    key: jax.Array            # PRNG key threaded through the episode
    dyn_params: Any           # (randomized) inertial parameter pytree
    dist_obs: jax.Array       # per-episode disturbance states by channel
    dist_act: jax.Array
    dist_dyn: jax.Array
    adv_action: jax.Array     # adversary action buffer
    adv_valid: jax.Array      # bool: adversary action set this step


@struct.dataclass
class StepOut:
    """Fixed-shape step output (the functional analog of (obs, rew, done, info))."""
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    truncated: jax.Array      # TimeLimit.truncated semantics (:497-501)
    mse: jax.Array
    constraint_values: jax.Array
    constraint_violation: jax.Array  # i32 0/1
    goal_reached: jax.Array
    out_of_bounds: jax.Array
    state: jax.Array          # underlying physical state (RecordDataWrapper parity)
    noisy_action: jax.Array   # current_noisy_physical_action
    clipped_action: jax.Array  # current_clipped_action
    physical_action: jax.Array


def _compile_rand_sampler(rand_info: Dict[str, Dict], names) -> Callable:
    """Compile a {name: {distrib, args/kwargs}} spec into a pure additive
    sampler (parity with _randomize_values_by_info, benchmark_env.py:237-268).

    Returns fn(key, base: dict[str, scalar/array]) -> dict with randomized
    entries (base + draw).
    """
    entries = []
    for name in names:
        if name not in rand_info:
            continue
        info = dict(rand_info[name])
        distrib = info.pop('distrib')
        args = info.pop('args', [])
        kwargs = dict(info)
        entries.append((name, distrib, args, kwargs))

    # Hot-loop fast path: when every entry is a scalar-bounded uniform (the
    # common init-state spec) and all base shapes agree, ALL entries come
    # from one vmapped (E, ...) draw over the split keys + one affine map —
    # the general path issues an RNG kernel launch PER entry, which is the
    # dominant cost of batched auto-reset inside the fused rollout scan
    # (measured on v5e: part of a 4.5 us/step reset overhead on a 13 us
    # step). Per-key streams and the max(minval, u*(hi-lo)+lo) scaling
    # mirror jax.random.uniform exactly, so the sampled values are
    # BIT-IDENTICAL to the general path (seeded tests depend on this).
    uniform_bounds = []
    for (_name, distrib, args, kwargs) in entries:
        if distrib != 'uniform':
            uniform_bounds = None
            break
        low = kwargs.get('low', args[0] if args else 0.0)
        high = kwargs.get('high', args[1] if len(args) > 1 else 1.0)
        if np.ndim(low) != 0 or np.ndim(high) != 0:
            uniform_bounds = None
            break
        uniform_bounds.append((float(low), float(high)))

    def sample(key, base):
        out = dict(base)
        if not entries:
            return out
        if uniform_bounds is not None:
            shapes = {jnp.shape(jnp.asarray(base[name]))
                      for name, *_ in entries}
            if len(shapes) == 1:
                shape = next(iter(shapes))
                e = len(entries)
                lo = jnp.asarray([b[0] for b in uniform_bounds],
                                 jnp.float32).reshape((e,) + (1,) * len(shape))
                hi = jnp.asarray([b[1] for b in uniform_bounds],
                                 jnp.float32).reshape((e,) + (1,) * len(shape))
                keys = jax.random.split(key, e)
                u = jax.vmap(lambda k: jax.random.uniform(k, shape))(keys)
                draws = jnp.maximum(lo, u * (hi - lo) + lo)
                for i, (name, *_rest) in enumerate(entries):
                    out[name] = jnp.asarray(base[name]) + draws[i]
                return out
        keys = jax.random.split(key, len(entries))
        for (name, distrib, args, kwargs), k in zip(entries, keys):
            shape = jnp.shape(jnp.asarray(base[name]))
            if distrib == 'uniform':
                low = kwargs.get('low', args[0] if args else 0.0)
                high = kwargs.get('high', args[1] if len(args) > 1 else 1.0)
                draw = jax.random.uniform(k, shape, minval=low, maxval=high)
            elif distrib in ('normal', 'standard_normal', 'gaussian'):
                loc = kwargs.get('loc', args[0] if args else 0.0)
                scale = kwargs.get('scale', args[1] if len(args) > 1 else 1.0)
                draw = loc + scale * jax.random.normal(k, shape)
            elif distrib == 'choice':
                options = jnp.asarray(args[0], dtype=jnp.float32)
                idx = jax.random.randint(k, shape, 0, options.shape[0])
                draw = options[idx]
            else:
                raise ValueError(f'Unsupported randomization distrib: {distrib}')
            out[name] = jnp.asarray(base[name]) + draw
        return out

    return sample


class FuncEnv:
    """Functional view of an env: pure reset/step closures + dims.

    This is what vectorized training and multi-chip sharding consume;
    built by BenchmarkEnv._build_functional().

    ``reset_batch``/``step_autoreset`` are the batched HOT-LOOP variants:
    when the env has no inertial-prop randomization and no disturbance
    STATE, a reset only needs a fresh init state, so the batched reset
    samples the whole batch with one PRNG draw per randomized entry and
    the auto-reset touches only (state, ctrl_step) — instead of a full
    per-env ``vmap(reset)`` plus a where-select over every EnvState leaf,
    which measured ~2x the entire step cost at 4096 envs on v5e.
    Disturbance randomness is likewise pre-drawn at batch level (one
    (B, dim) kernel per stochastic channel) and consumed by a drawn-mode
    step with no per-env key splits — stochastic envs run within ~20% of
    deterministic ones (205.8M vs 258.8M cartpole steps/s, v5e)."""

    def __init__(self, reset_fn, step_fn, obs_dim, act_dim, state_dim,
                 n_constraints, max_steps, reset_batch=None,
                 step_autoreset=None):
        self.reset = reset_fn          # (key) -> (EnvState, obs)
        self.step = step_fn            # (EnvState, action) -> (EnvState, StepOut)
        self.reset_batch = reset_batch          # (key, n) -> (EnvState[n], obs[n])
        self.step_autoreset = step_autoreset    # (EnvState[n], act[n], key) -> (EnvState[n], StepOut[n], obs[n])
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.state_dim = state_dim
        self.n_constraints = n_constraints
        self.max_steps = max_steps


class _LiveViewer:
    """Persistent interactive render window for ``gui=True`` envs.

    Fills the role of the reference's per-env PyBullet GUI client
    (cartpole.py:173-180, base_aviary.py:186-230): a window that tracks
    the simulation live, one redraw per control step. Implementation is a
    single reused matplotlib figure; with an interactive backend (a host
    with a display) the window shows and flushes events each update, and
    under a headless backend (Agg) the same figure is drawn offscreen so
    ``gui: True`` configs run unchanged on display-less TPU hosts.
    ``frame_count`` exposes redraws for tests/observability.
    """

    def __init__(self, title='safe-control-gym'):
        import matplotlib
        import matplotlib.pyplot as plt
        self._plt = plt
        backend = matplotlib.get_backend().lower()
        self.interactive = not any(
            backend.startswith(h) for h in
            ('agg', 'pdf', 'svg', 'ps', 'cairo', 'template'))
        self.fig, self.ax = plt.subplots(figsize=(5, 4), dpi=80)
        self.frame_count = 0
        try:
            self.fig.canvas.manager.set_window_title(title)
        except Exception:
            pass
        if self.interactive:
            plt.ion()
            self.fig.show()

    def update(self, draw_fn):
        """Redraw: clear the axes, let the env draw itself, flush."""
        self.ax.cla()
        draw_fn(self.ax)
        self.ax.set_aspect('equal')
        if self.interactive:
            self.fig.canvas.draw_idle()
            self.fig.canvas.flush_events()
        else:
            self.fig.canvas.draw()
        self.frame_count += 1

    def close(self):
        self._plt.close(self.fig)


class BenchmarkEnv(gym.Env):
    """Stateful shim + functional core builder. Subclasses: CartPole, Quadrotor."""

    NAME = 'base'
    DISTURBANCE_MODES: Dict[str, Dict] = {}
    INERTIAL_PROP_RAND_INFO: Dict[str, Dict] = {}
    INIT_STATE_RAND_INFO: Dict[str, Dict] = {}
    TASK_INFO: Dict[str, Any] = {}
    AVAILABLE_CONSTRAINTS: Dict[str, Any] = {}

    _idx_counter = 0

    def __init__(self,
                 output_dir=None,
                 seed: Optional[int] = None,
                 info_in_reset: bool = True,
                 gui: bool = False,
                 verbose: bool = False,
                 normalized_rl_action_space: bool = False,
                 task: str = 'stabilization',
                 cost: str = 'rl_reward',
                 pyb_freq: int = 50,
                 ctrl_freq: int = 50,
                 episode_len_sec: int = 5,
                 init_state=None,
                 randomized_init: bool = True,
                 init_state_randomization_info=None,
                 inertial_prop=None,
                 randomized_inertial_prop: bool = False,
                 inertial_prop_randomization_info=None,
                 task_info=None,
                 constraints=None,
                 done_on_violation: bool = False,
                 use_constraint_penalty: bool = False,
                 constraint_penalty: float = 1.0,
                 disturbances=None,
                 adversary_disturbance=None,
                 adversary_disturbance_offset: float = 0.0,
                 adversary_disturbance_scale: float = 0.01,
                 pallas_physics: bool = True,
                 **kwargs):
        # Unique id per instance (benchmark_env.py:125-127).
        self.pallas_physics = bool(pallas_physics)
        self.idx = BenchmarkEnv._idx_counter
        BenchmarkEnv._idx_counter += 1
        # gui=True opens a live viewer window updated every reset/step
        # (reference: a PyBullet GUI client per env, cartpole.py:173-180).
        # Built lazily on first use so headless batch jobs pay nothing.
        self.GUI = gui
        self._viewer = None
        self.VERBOSE = verbose
        self.output_dir = output_dir
        self.NORMALIZED_RL_ACTION_SPACE = normalized_rl_action_space

        # Timing (benchmark_env.py:138-148).
        self.CTRL_FREQ = int(ctrl_freq)
        self.PYB_FREQ = int(pyb_freq)
        if self.PYB_FREQ % self.CTRL_FREQ != 0:
            raise ValueError('pyb_freq is not divisible by env_freq.')
        self.PYB_STEPS_PER_CTRL = int(self.PYB_FREQ / self.CTRL_FREQ)
        self.CTRL_TIMESTEP = 1.0 / self.CTRL_FREQ
        self.PYB_TIMESTEP = 1.0 / self.PYB_FREQ
        self.EPISODE_LEN_SEC = episode_len_sec
        self.CTRL_STEPS = int(self.EPISODE_LEN_SEC * self.CTRL_FREQ)

        # Task & cost.
        self.TASK = Task(task)
        self.COST = Cost(cost)
        if task_info is not None:
            self.TASK_INFO = dict(self.TASK_INFO, **dict(task_info))
        else:
            self.TASK_INFO = dict(self.TASK_INFO)

        # Initial state / randomization config.
        self.init_state = init_state
        self.RANDOMIZED_INIT = bool(randomized_init)
        if init_state_randomization_info is not None:
            self.INIT_STATE_RAND_INFO = copy.deepcopy(dict(init_state_randomization_info))
        else:
            self.INIT_STATE_RAND_INFO = copy.deepcopy(self.INIT_STATE_RAND_INFO)
        self.inertial_prop = inertial_prop
        self.RANDOMIZED_INERTIAL_PROP = bool(randomized_inertial_prop)
        if inertial_prop_randomization_info is not None:
            self.INERTIAL_PROP_RAND_INFO = copy.deepcopy(dict(inertial_prop_randomization_info))
        else:
            self.INERTIAL_PROP_RAND_INFO = copy.deepcopy(self.INERTIAL_PROP_RAND_INFO)

        # Constraints (benchmark_env.py:297-303).
        self.CONSTRAINTS = constraints
        self.DONE_ON_VIOLATION = bool(done_on_violation)
        self.use_constraint_penalty = use_constraint_penalty
        self.constraint_penalty = constraint_penalty
        self.constraints = None

        # Disturbances (benchmark_env.py:279-295).
        self.DISTURBANCES = disturbances
        self.adversary_disturbance = adversary_disturbance
        self.adversary_disturbance_offset = adversary_disturbance_offset
        self.adversary_disturbance_scale = adversary_disturbance_scale

        # Mutable episode mirrors (populated by reset/step).
        self.state = None
        self.ctrl_step_counter = 0
        self.pyb_step_counter = 0
        self.current_raw_action = None
        self.current_physical_action = None
        self.current_noisy_physical_action = None
        self.current_clipped_action = None
        self.adv_action = None
        self.at_reset = False
        self.initial_reset = False
        self.goal_reached = False
        self.out_of_bounds = False

        self._seed_value = seed
        self.seed(seed)

    # ------------------------------------------------------------------
    # Seeding (benchmark_env.py:193-214): numpy generator for host-side
    # compat + a JAX key chain for the functional core.
    # ------------------------------------------------------------------
    def seed(self, seed=None):
        seed = int(seed) if seed is not None else np.random.SeedSequence().entropy % (2 ** 31)
        self._seed_value = seed          # resolved seed (also seeds spaces)
        self.np_random = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        if hasattr(self, 'action_space') and self.action_space is not None:
            self.action_space.seed(seed)
        return [seed]

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    # Setup helpers called by subclasses
    # ------------------------------------------------------------------
    def _setup_constraints(self):
        """Build the ConstraintList from YAML specs (benchmark_env.py:297-303)."""
        self.constraints = None
        self.num_constraints = 0
        if self.CONSTRAINTS is not None:
            self.constraints = constraints_mod.create_constraint_list(
                self.CONSTRAINTS, self.AVAILABLE_CONSTRAINTS, self)
            self.num_constraints = self.constraints.num_constraints

    def _setup_disturbances(self):
        """Build per-channel DisturbanceLists + adversary spaces
        (benchmark_env.py:279-295)."""
        self.disturbances: Dict[str, disturbances_mod.DisturbanceList] = {}
        if self.DISTURBANCES is not None:
            for mode, spec in dict(self.DISTURBANCES).items():
                assert mode in self.DISTURBANCE_MODES, \
                    '[ERROR] in BenchmarkEnv._setup_disturbances, disturbance mode not available.'
                mode_shared_args = self.DISTURBANCE_MODES[mode]
                self.disturbances[mode] = disturbances_mod.create_disturbance_list(
                    spec, mode_shared_args, self.CTRL_STEPS)
        # Adversary disturbance (RARL/RAP).
        if self.adversary_disturbance is not None:
            assert self.adversary_disturbance in self.DISTURBANCE_MODES, \
                '[ERROR] adversary_disturbance mode not available.'
            dim = self.DISTURBANCE_MODES[self.adversary_disturbance]['dim']
            self.adversary_action_space = spaces.Box(low=-1.0, high=1.0, shape=(dim,))
            self.adv_action_dim = dim
        else:
            self.adversary_action_space = None
            self.adv_action_dim = max(
                (m['dim'] for m in self.DISTURBANCE_MODES.values()), default=1)

    def set_adversary_control(self, action):
        """Buffer the adversary's action for the next step
        (benchmark_env.py:216-228)."""
        if self.adversary_disturbance is not None:
            clipped = np.clip(action, self.adversary_action_space.low,
                              self.adversary_action_space.high)
            self.adv_action = (clipped * self.adversary_disturbance_scale
                               + self.adversary_disturbance_offset)

    def _setup_task_references(self):
        """Build X_GOAL/U_GOAL; subclass provides _state_goal_from_xyz and
        trajectory column layout via _traj_to_goal."""
        raise NotImplementedError

    def _generate_trajectory(self, **kwargs):
        return generate_trajectory(**kwargs)

    # ------------------------------------------------------------------
    # Subclass hooks for the functional core
    # ------------------------------------------------------------------
    def _nominal_dyn_params(self):
        raise NotImplementedError

    def _sample_dyn_params(self, key, nominal):
        raise NotImplementedError

    def _nominal_init_state(self) -> np.ndarray:
        raise NotImplementedError

    def _sample_init_state_batch(self, key, nominal, n: int):
        """Batched init-state sampling: ONE PRNG draw per randomized entry
        for the whole batch (the subclass samplers are shape-polymorphic:
        feeding (dim, n) nominal columns makes every per-entry draw a
        (n,)-shaped op instead of n vmapped per-env key splits)."""
        nominal = jnp.asarray(nominal, jnp.float32)
        cols = jnp.broadcast_to(nominal[:, None], (nominal.shape[0], n))
        return self._sample_init_state(key, cols).T

    def _sample_init_state(self, key, nominal):
        raise NotImplementedError

    def _denormalize_action_pure(self, action):
        raise NotImplementedError

    def _advance_pure(self, x, clipped_action, dyn_force, params):
        raise NotImplementedError

    def _rl_reward_pure(self, state, noisy_action, step):
        raise NotImplementedError

    def _quadratic_reward_pure(self, state, clipped_action, step):
        raise NotImplementedError

    def _oob_pure(self, state):
        raise NotImplementedError

    def _mse_pure(self, state, step):
        raise NotImplementedError

    def _obs_transform_pure(self, state, key):
        """State -> observation before goal extension (wrap/noise handled
        by caller); identity by default."""
        return state

    # ------------------------------------------------------------------
    # Functional core assembly
    # ------------------------------------------------------------------
    def _extend_obs_pure(self, obs, next_step):
        """Goal-horizon obs augmentation (benchmark_env.py:422-445)."""
        horizon = getattr(self, 'obs_goal_horizon', 0)
        if self.COST != Cost.RL_REWARD or horizon <= 0:
            return obs
        X_GOAL = jnp.asarray(self.X_GOAL, dtype=jnp.float32)
        if self.TASK == Task.TRAJ_TRACKING:
            idx = jnp.clip(next_step + jnp.arange(horizon), 0, X_GOAL.shape[0] - 1)
            goal = X_GOAL[idx].reshape(-1)
        else:
            goal = X_GOAL.reshape(-1)
        return jnp.concatenate([obs, goal])

    def _build_functional(self):
        """Compile reset_fn/step_fn closures over the static config."""
        # Subclasses call this after their spaces exist, but __init__'s
        # seed() ran BEFORE action_space was created — seed it now so
        # action_space.sample() is deterministic per (env, seed) instead of
        # drawing from process-global entropy (the reference seeds env AND
        # action_space, benchmark_env.py:193-214; an unseeded space made
        # GP-MPC's sampled training data depend on process history).
        if getattr(self, 'action_space', None) is not None \
                and self._seed_value is not None:
            self.action_space.seed(int(self._seed_value))
        state_dim = self.state_dim
        act_dim = self.action_dim
        CTRL_STEPS = self.CTRL_STEPS
        nominal_params = self._nominal_dyn_params()
        nominal_init = jnp.asarray(self._nominal_init_state(), dtype=jnp.float32)
        phys_lo = jnp.asarray(np.asarray(self.physical_action_bounds[0], dtype=np.float32))
        phys_hi = jnp.asarray(np.asarray(self.physical_action_bounds[1], dtype=np.float32))
        dist_obs = self.disturbances.get('observation')
        dist_act = self.disturbances.get('action')
        dist_dyn = self.disturbances.get('dynamics')
        dyn_dim = self.DISTURBANCE_MODES.get('dynamics', {'dim': 1})['dim']
        adv_mode = self.adversary_disturbance
        adv_dim = self.adv_action_dim
        constraints = self.constraints
        n_con = self.num_constraints
        done_on_violation = self.DONE_ON_VIOLATION
        use_penalty = self.use_constraint_penalty
        penalty = self.constraint_penalty
        rew_exponential = bool(getattr(self, 'rew_exponential', True))
        cost = self.COST
        task = self.TASK
        stab_tol = self.TASK_INFO.get('stabilization_goal_tolerance', 0.0)
        X_GOAL = jnp.asarray(np.atleast_2d(self.X_GOAL), dtype=jnp.float32)
        done_on_oob = bool(getattr(self, 'done_on_out_of_bound', False))
        randomized_init = self.RANDOMIZED_INIT
        randomized_prop = self.RANDOMIZED_INERTIAL_PROP
        pyb_dt = self.PYB_TIMESTEP

        def reset_fn(key):
            k_prop, k_init, k_do, k_da, k_dd, k_obs, k_carry = jax.random.split(key, 7)
            params = (self._sample_dyn_params(k_prop, nominal_params)
                      if randomized_prop else nominal_params)
            x0 = (self._sample_init_state(k_init, nominal_init)
                  if randomized_init else nominal_init)
            est = EnvState(
                state=x0,
                ctrl_step=jnp.zeros((), jnp.int32),
                key=k_carry,
                dyn_params=params,
                dist_obs=dist_obs.init(k_do) if dist_obs else jnp.zeros((0,)),
                dist_act=dist_act.init(k_da) if dist_act else jnp.zeros((0,)),
                dist_dyn=dist_dyn.init(k_dd) if dist_dyn else jnp.zeros((0,)),
                adv_action=jnp.zeros((adv_dim,), jnp.float32),
                adv_valid=jnp.zeros((), bool),
            )
            obs = self._observe(est, x0, k_obs, at_reset=True)
            return est, obs

        # PRNG is only consumed by disturbances; without any configured,
        # the per-step 4-way key split is pure overhead in the hot loop
        # (RBG bit-generation was ~1/3 of step cost at 4096 envs) — the
        # carried key passes through untouched. With disturbances, the
        # batched hot loop avoids per-env splits entirely: every supported
        # disturbance either needs per-step randomness but NO state
        # (uniform/white/periodic) or state but NO per-step randomness
        # (impulse/step), so ``step_autoreset`` pre-draws each channel's
        # noise for the whole batch in one kernel and runs the drawn-mode
        # step (measured on v5e: constrained cartpole 100.8M -> see
        # PERFORMANCE.md).
        needs_step_rng = bool(dist_act) or bool(dist_dyn) or bool(dist_obs)

        def _make_step(drawn_mode):
            def step_impl(est: EnvState, action, drawn_act=None,
                          drawn_dyn=None, drawn_obs=None):
                if not drawn_mode and needs_step_rng:
                    key, k_act, k_dyn, k_obs = jax.random.split(est.key, 4)
                else:
                    key = k_act = k_dyn = k_obs = est.key
                raw = jnp.atleast_1d(jnp.squeeze(jnp.asarray(action, dtype=jnp.float32)))
                raw = raw.reshape((act_dim,))
                phys = self._denormalize_action_pure(raw)
                t = est.ctrl_step.astype(jnp.float32) * self.CTRL_TIMESTEP
                noisy = phys
                if dist_act:
                    noisy = (dist_act.apply_drawn(noisy, est.dist_act,
                                                  est.ctrl_step, t, drawn_act)
                             if drawn_mode else
                             dist_act.apply(noisy, est.dist_act,
                                            est.ctrl_step, t, k_act))
                if adv_mode == 'action':
                    noisy = noisy + jnp.where(est.adv_valid, est.adv_action[:act_dim], 0.0)
                clipped = jnp.clip(noisy, phys_lo, phys_hi)
                # Dynamics disturbance force (world frame).
                dyn_force = jnp.zeros((dyn_dim,), jnp.float32)
                if dist_dyn:
                    dyn_force = (dist_dyn.apply_drawn(dyn_force, est.dist_dyn,
                                                      est.ctrl_step, t, drawn_dyn)
                                 if drawn_mode else
                                 dist_dyn.apply(dyn_force, est.dist_dyn,
                                                est.ctrl_step, t, k_dyn))
                if adv_mode == 'dynamics':
                    dyn_force = dyn_force + jnp.where(est.adv_valid,
                                                      est.adv_action[:dyn_dim], 0.0)
                # Physics: substeps fused under scan (subclass).
                x_new = self._advance_pure(est.state, clipped, dyn_force, est.dyn_params)
                step = est.ctrl_step  # counter not yet incremented (reference semantics)
                # Observation with noise + goal extension (ctrl_step+2, :422-445).
                est_new = est.replace(state=x_new, key=key,
                                      adv_valid=jnp.zeros((), bool))
                if drawn_mode:
                    obs = self._observe_drawn(est_new, x_new, drawn_obs,
                                              at_reset=False)
                else:
                    obs = self._observe(est_new, x_new, k_obs, at_reset=False)
                # Reward.
                if cost == Cost.RL_REWARD:
                    reward = self._rl_reward_pure(x_new, noisy, step)
                else:
                    reward = self._quadratic_reward_pure(x_new, clipped, step)
                # Done conditions.
                if task == Task.STABILIZATION:
                    goal_reached = jnp.linalg.norm(
                        x_new - X_GOAL[0]) < stab_tol
                else:
                    goal_reached = jnp.zeros((), bool)
                oob = self._oob_pure(x_new) if done_on_oob else jnp.zeros((), bool)
                done = jnp.logical_or(goal_reached if task == Task.STABILIZATION
                                      else jnp.zeros((), bool), oob)
                # Constraints (after_step, benchmark_env.py:465-494).
                if constraints is not None and n_con > 0:
                    c_values = constraints.values_from(x_new, noisy)
                    violated = constraints.violated_mask(c_values)
                else:
                    c_values = jnp.zeros((n_con,), jnp.float32)
                    violated = jnp.zeros((), bool)
                if done_on_violation:
                    done = jnp.logical_or(done, violated)
                if cost == Cost.RL_REWARD and use_penalty and constraints is not None:
                    if rew_exponential:
                        log_rew = jnp.log(jnp.clip(reward, 1e-30)) - penalty
                        reward = jnp.where(violated, jnp.exp(log_rew), reward)
                    else:
                        reward = jnp.where(violated, reward - penalty, reward)
                # Counters + time limit (:496-501).
                new_step = est.ctrl_step + 1
                timeout = new_step >= CTRL_STEPS
                truncated = jnp.logical_and(timeout, jnp.logical_not(done))
                done = jnp.logical_or(done, timeout)
                mse = self._mse_pure(x_new, step)
                est_new = est_new.replace(ctrl_step=new_step)
                out = StepOut(
                    obs=obs,
                    reward=jnp.asarray(reward, jnp.float32),
                    done=done,
                    truncated=truncated,
                    mse=jnp.asarray(mse, jnp.float32),
                    constraint_values=c_values,
                    constraint_violation=violated.astype(jnp.int32),
                    goal_reached=goal_reached,
                    out_of_bounds=oob,
                    state=x_new,
                    noisy_action=noisy,
                    clipped_action=clipped,
                    physical_action=phys,
                )
                return est_new, out
            return step_impl

        _step_impl = _make_step(False)
        _step_drawn = _make_step(True)

        def step_fn(est: EnvState, action):
            return _step_impl(est, action)

        # -- batched hot-loop variants --------------------------------
        # A reset re-randomizes only the init state when there is no
        # inertial-prop randomization and no disturbance STATE: stateless
        # disturbances (uniform/white/periodic) carry zero-size dist_*
        # arrays, so auto-reset still touches only (state, ctrl_step) and
        # the batched reset needs one PRNG draw per randomized entry for
        # the WHOLE batch.
        dist_state_size = sum(dl.state_size for dl in
                              (dist_obs, dist_act, dist_dyn) if dl)
        simple_reset = not randomized_prop and dist_state_size == 0
        has_dist = needs_step_rng
        step_v = jax.vmap(step_fn)
        # Drawn-mode batched step: per-channel noise pre-drawn at batch
        # level rides in as mapped arguments; no per-env key math at all.
        step_drawn_v = jax.vmap(_step_drawn) if has_dist else None
        obs_at_reset_v = jax.vmap(
            lambda x, k: self._extend_obs_pure(
                self._obs_transform_pure(x, k), 1),
            in_axes=(0, None))
        if dist_obs is not None:
            # Reset-time obs noise (noise -> goal extension order, parity
            # with _observe(at_reset=True)): batch-drawn noise applied to
            # the transformed state at ctrl_step 0 / t 0.
            _empty_obs_dstate = jnp.zeros((dist_obs.state_size,), jnp.float32)
            obs_at_reset_drawn_v = jax.vmap(
                lambda x, dn, k: self._extend_obs_pure(
                    dist_obs.apply_drawn(
                        self._obs_transform_pure(x, k), _empty_obs_dstate,
                        jnp.zeros((), jnp.int32), jnp.zeros(()), dn), 1),
                in_axes=(0, 0, None))

        def _draw_channel_noise(key, n):
            """One fused (n, noise_size) kernel per stochastic channel."""
            k_a, k_d, k_o = jax.random.split(key, 3)
            da = dist_act.draw(k_a, (n,)) if dist_act else None
            dd = dist_dyn.draw(k_d, (n,)) if dist_dyn else None
            do = dist_obs.draw(k_o, (n,)) if dist_obs else None
            return da, dd, do

        def _fresh_states_batch(key, n):
            if randomized_init:
                return self._sample_init_state_batch(key, nominal_init, n)
            return jnp.broadcast_to(nominal_init,
                                    (n,) + nominal_init.shape)

        def _reset_obs_batch(x0, k_obs, n):
            """Batched reset observation incl. obs-channel noise."""
            if dist_obs is None:
                return obs_at_reset_v(x0, k_obs)
            return obs_at_reset_drawn_v(
                x0, dist_obs.draw(jax.random.fold_in(k_obs, 1), (n,)), k_obs)

        def reset_batch_fn(key, n):
            if not simple_reset:
                return jax.vmap(reset_fn)(jax.random.split(key, n))
            k_init, k_obs, k_carry = jax.random.split(key, 3)
            x0 = _fresh_states_batch(k_init, n)
            params_b = jax.tree.map(
                lambda v: jnp.broadcast_to(jnp.asarray(v),
                                           (n,) + jnp.shape(jnp.asarray(v))),
                nominal_params)
            est = EnvState(
                state=x0,
                ctrl_step=jnp.zeros((n,), jnp.int32),
                # Without disturbances the per-step key is unused — share
                # one key instead of n splits. With (stateless)
                # disturbances, vmap(func.step) consumes per-env keys, so
                # they must be distinct (step_autoreset itself pre-draws
                # noise at batch level and never touches them).
                key=(jax.random.split(k_carry, n) if has_dist else
                     jnp.broadcast_to(k_carry, (n,) + k_carry.shape)),
                dyn_params=params_b,
                dist_obs=jnp.zeros((n, dist_obs.state_size if dist_obs else 0)),
                dist_act=jnp.zeros((n, dist_act.state_size if dist_act else 0)),
                dist_dyn=jnp.zeros((n, dist_dyn.state_size if dist_dyn else 0)),
                adv_action=jnp.zeros((n, adv_dim), jnp.float32),
                adv_valid=jnp.zeros((n,), bool),
            )
            return est, _reset_obs_batch(x0, k_obs, n)

        def step_autoreset_fn(states, actions, key):
            n = actions.shape[0]
            if has_dist:
                k_noise, key = jax.random.split(key)
                da, dd, do = _draw_channel_noise(k_noise, n)
                # (None channels are empty pytrees — vmap maps nothing.)
                states, out = step_drawn_v(states, actions, da, dd, do)
            else:
                states, out = step_v(states, actions)
            if simple_reset:
                k_init, k_obs = jax.random.split(key)
                x0 = _fresh_states_batch(k_init, n)
                done_col = out.done[:, None]
                states = states.replace(
                    state=jnp.where(done_col, x0, states.state),
                    ctrl_step=jnp.where(out.done, 0, states.ctrl_step))
                obs = jnp.where(done_col, _reset_obs_batch(x0, k_obs, n),
                                out.obs)
            else:
                fresh, fresh_obs = reset_batch_fn(key, n)
                states = jax.tree.map(
                    lambda f, s: jnp.where(
                        out.done.reshape((n,) + (1,) * (s.ndim - 1)), f, s),
                    fresh, states)
                obs = jnp.where(out.done[:, None], fresh_obs, out.obs)
            return states, out, obs

        self.func = FuncEnv(reset_fn, step_fn,
                            obs_dim=int(np.prod(self.observation_space.shape)),
                            act_dim=act_dim, state_dim=state_dim,
                            n_constraints=n_con, max_steps=CTRL_STEPS,
                            reset_batch=reset_batch_fn,
                            step_autoreset=step_autoreset_fn)
        self._reset_jit = jax.jit(reset_fn)
        self._step_jit = jax.jit(step_fn)

    def _observe(self, est, x, key, at_reset):
        """Noisy observation + goal extension. next_step semantics:
        reset -> 1, step -> ctrl_step+2 (cartpole.py:600-608; but note
        _observe is called after state update and before counter increment,
        so est.ctrl_step+2 == (incremented counter)+1)."""
        obs = self._apply_obs_noise_impl(est, x, key)
        next_step = jnp.where(jnp.asarray(at_reset), 1, est.ctrl_step + 2)
        return self._extend_obs_pure(obs, next_step)

    def _apply_obs_noise_impl(self, est, x, key):
        obs = self._obs_transform_pure(x, key)
        dist_obs = self.disturbances.get('observation')
        if dist_obs:
            t = est.ctrl_step.astype(jnp.float32) * self.CTRL_TIMESTEP
            obs = dist_obs.apply(obs, est.dist_obs, est.ctrl_step, t, key)
        return obs

    def _observe_drawn(self, est, x, drawn_obs, at_reset):
        """``_observe`` with pre-drawn obs noise (batched hot loop): same
        noise -> goal-extension order, no per-env PRNG."""
        obs = self._obs_transform_pure(x, est.key)
        dist_obs = self.disturbances.get('observation')
        if dist_obs:
            t = est.ctrl_step.astype(jnp.float32) * self.CTRL_TIMESTEP
            obs = dist_obs.apply_drawn(obs, est.dist_obs, est.ctrl_step, t,
                                       drawn_obs)
        next_step = jnp.where(jnp.asarray(at_reset), 1, est.ctrl_step + 2)
        return self._extend_obs_pure(obs, next_step)

    # ------------------------------------------------------------------
    # Stateful gym API (shim over the functional core)
    # ------------------------------------------------------------------
    def _check_initial_reset(self):
        if not self.initial_reset:
            raise RuntimeError('[ERROR] You must call env.reset() at least once before using env.step().')

    def before_reset(self):
        self.initial_reset = True
        self.at_reset = True
        self.ctrl_step_counter = 0
        self.pyb_step_counter = 0
        self.current_raw_action = None
        self.current_physical_action = None
        self.current_noisy_physical_action = None
        self.current_clipped_action = None

    def reset(self, seed=None, options=None):
        if seed is not None:
            self.seed(seed)
        self.before_reset()
        est, obs = self._reset_jit(self._next_key())
        self._est = est
        self.state = np.asarray(est.state)
        self.goal_reached = False
        self.out_of_bounds = False
        obs = np.asarray(obs)
        self.at_reset = False
        info = self._get_reset_info()
        if self.GUI:
            self._update_viewer()
        return obs, info

    def step(self, action):
        self._check_initial_reset()
        action = np.atleast_1d(np.squeeze(np.asarray(action)))
        if action.ndim != 1:
            raise ValueError('[ERROR]: The action returned by the controller must be 1 dimensional.')
        self.current_raw_action = action
        if self.adv_action is not None:
            adv = np.zeros(self.adv_action_dim, dtype=np.float32)
            adv[:len(np.atleast_1d(self.adv_action))] = np.atleast_1d(self.adv_action)
            self._est = self._est.replace(adv_action=jnp.asarray(adv),
                                          adv_valid=jnp.ones((), bool))
            self.adv_action = None
        est, out = self._step_jit(self._est, jnp.asarray(action, dtype=jnp.float32))
        self._est = est
        # Host mirrors.
        self.state = np.asarray(out.state)
        self.ctrl_step_counter = int(est.ctrl_step)
        self.pyb_step_counter = self.ctrl_step_counter * self.PYB_STEPS_PER_CTRL
        self.current_physical_action = np.asarray(out.physical_action)
        self.current_noisy_physical_action = np.asarray(out.noisy_action)
        self.current_clipped_action = np.asarray(out.clipped_action)
        self.goal_reached = bool(out.goal_reached)
        self.out_of_bounds = bool(out.out_of_bounds)
        obs = np.asarray(out.obs)
        rew = float(out.reward)
        done = bool(out.done)
        info = self._build_info(out)
        if self.GUI:
            self._update_viewer()
        return obs, rew, done, info

    def set_reference(self, x_goal):
        """Public reference-override API: replace ``X_GOAL`` and rebuild the
        functional core around it.

        The reference mutates ``env.X_GOAL`` in place and every consumer
        follows (custom waypoint trajectories, examples/pid/
        pid_experiment.py:29-49). Here reward/MSE/goal-extension closures
        bake X_GOAL in at build time, so an override must recompile them;
        the live ``EnvState`` (and therefore a running episode) is
        unaffected — only the reward/termination views change."""
        x_goal = np.asarray(x_goal, np.float32)
        if self.TASK == Task.TRAJ_TRACKING:
            expected = int(np.atleast_2d(np.asarray(self.X_GOAL)).shape[1])
            if np.atleast_2d(x_goal).shape[1] != expected:
                raise ValueError(
                    f'[ERROR] set_reference: expected {expected} state '
                    f'columns, got {np.atleast_2d(x_goal).shape[1]}.')
        self.X_GOAL = x_goal
        self._build_functional()

    def set_state(self, state):
        """Public set-state API: overwrite the physical state mid-episode.

        Consumers that need to start transitions from chosen states (GP-MPC
        data collection, reference gp_mpc.py:704-757; iLQR rollouts; tests)
        use this instead of poking the functional ``EnvState``; the host
        mirrors stay consistent. Returns the extended observation of the new
        state (noise applied if an observation disturbance is configured),
        matching what ``step`` would have observed at the current counter.
        """
        self._check_initial_reset()
        state = np.asarray(state, np.float32).reshape(self.state_dim)
        state_j = jnp.asarray(state)
        self._est = self._est.replace(state=state_j)
        self.state = state
        obs = self._apply_obs_noise_impl(self._est, state_j, self._next_key())
        obs = self._extend_obs_pure(obs, int(self._est.ctrl_step) + 1)
        return np.asarray(obs)

    def _build_info(self, out: StepOut) -> Dict[str, Any]:
        """Reference-style step info dict (cartpole.py:674-696 +
        after_step additions)."""
        info: Dict[str, Any] = {}
        if self.TASK == Task.STABILIZATION and self.COST == Cost.QUADRATIC:
            info['goal_reached'] = bool(out.goal_reached)
        if getattr(self, 'done_on_out_of_bound', False):
            info['out_of_bounds'] = bool(out.out_of_bounds)
        info['mse'] = float(out.mse)
        info['current_step'] = self.ctrl_step_counter
        if self.constraints is not None:
            info['constraint_values'] = np.asarray(out.constraint_values)
        info['constraint_violation'] = int(out.constraint_violation)
        if bool(out.truncated):
            info['TimeLimit.truncated'] = True
        return info

    def _get_reset_info(self) -> Dict[str, Any]:
        """Reset info with symbolic model/constraints/priors
        (cartpole.py:698-717, benchmark_env.py:355)."""
        info: Dict[str, Any] = {
            'symbolic_model': self.symbolic,
            'physical_parameters': self._physical_parameters(),
            'x_reference': self.X_GOAL,
            'u_reference': self.U_GOAL,
            'current_step': 0,
        }
        if self.constraints is not None:
            info['symbolic_constraints'] = self.constraints.get_all_symbolic_models()
            # Cannot evaluate input constraints without an action at reset.
            info['constraint_values'] = self.constraints.get_values(self, only_state=True)
        return info

    def _physical_parameters(self) -> Dict[str, Any]:
        """This episode's (possibly randomized) physical parameters."""
        if getattr(self, '_est', None) is not None:
            return {k: np.asarray(v) for k, v in
                    vars(self._est.dyn_params).items()} if hasattr(
                        self._est.dyn_params, '__dict__') else {
                        k: np.asarray(getattr(self._est.dyn_params, k))
                        for k in self._est.dyn_params.__dataclass_fields__}
        return {}

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    def _update_viewer(self):
        """Draw the current state into the live GUI window.

        The interactive analog of the reference's PyBullet GUI client
        (cartpole.py:173-180): one persistent matplotlib figure per env,
        redrawn from ``_draw_state`` every reset/step. On a host with a
        display the window updates live (and `BaseExperiment` paces it to
        ``visualization_time_multiplier`` x realtime); on a headless host
        the identical draw path runs offscreen, so GUI-mode scripts remain
        runnable (and testable) without an X server.
        """
        if self._viewer is None:
            self._viewer = _LiveViewer(title=f'{type(self).__name__} {self.idx}')
        self._viewer.update(self._draw_state)

    def render(self, mode='rgb_array'):
        """Rasterize the current state to an RGB frame.

        The reference renders via the PyBullet camera (cartpole.py:376-383,
        base_aviary.py:333-347); here a light matplotlib rasterization of
        the analytic state serves the same debugging/video role headlessly.
        ``mode='human'`` routes to the live viewer window instead.
        """
        if mode == 'human':
            self._update_viewer()
            return None
        import matplotlib
        if self._viewer is None or not self._viewer.interactive:
            matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(4, 3), dpi=80)
        self._draw_state(ax)
        ax.set_aspect('equal')
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        plt.close(fig)
        return frame

    def _draw_state(self, ax):
        ax.text(0.5, 0.5, str(np.round(self.state, 2)), ha='center')

    def _plot_trajectory(self, traj_type, traj_plane, traj_length,
                         num_cycles, pos_ref_traj, vel_ref_traj, speed_traj,
                         save_path=None):
        """Debug plot of a generated reference trajectory: per-axis
        position/velocity panels + a 3D projection (benchmark_env.py:715-780).
        Headless: saves to ``save_path`` (default: the plot figure is
        returned, not shown)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        pos_ref_traj = np.asarray(pos_ref_traj)
        vel_ref_traj = np.asarray(vel_ref_traj)
        speed_traj = np.asarray(speed_traj)
        print(f'Trajectory type: {traj_type}')
        print(f'Trajectory plane: {traj_plane}')
        print(f'Trajectory length: {traj_length} sec')
        print(f'Number of cycles: {num_cycles}')
        print(f'Trajectory period: {traj_length / num_cycles:.2f} sec')
        print('Speed: min %.2f m/s max %.2f m/s mean %.2f' %
              (speed_traj.min(), speed_traj.max(), speed_traj.mean()))
        fig = plt.figure(figsize=(9, 6))
        t = np.linspace(0.0, traj_length, pos_ref_traj.shape[0],
                        endpoint=False)
        for i, lab in enumerate('xyz'):
            ax = fig.add_subplot(3, 3, 3 * i + 1)
            ax.plot(t, pos_ref_traj[:, i])
            ax.set_ylabel(f'pos {lab} (m)')
            ax = fig.add_subplot(3, 3, 3 * i + 2)
            ax.plot(t, vel_ref_traj[:, i])
            ax.set_ylabel(f'vel {lab} (m/s)')
        ax3d = fig.add_subplot(1, 3, 3, projection='3d')
        ax3d.plot(pos_ref_traj[:, 0], pos_ref_traj[:, 1], pos_ref_traj[:, 2])
        ax3d.set_xlabel('x [m]')
        ax3d.set_ylabel('y [m]')
        ax3d.set_zlabel('z [m]')
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=90)
            plt.close(fig)
            return save_path
        return fig

    # Properties for parity.
    @property
    def state_dim(self):
        return self.state_space.shape[0]

    @property
    def action_dim(self):
        return self.action_space.shape[0]

    @property
    def obs_dim(self):
        return self.observation_space.shape[0]

    def denormalize_action(self, action):
        raise NotImplementedError

    def normalize_action(self, action):
        raise NotImplementedError

    def _setup_symbolic(self, prior_prop={}, **kwargs):
        raise NotImplementedError
