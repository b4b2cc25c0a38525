"""Differentiable simulation: optimize actions by gradient through physics.

The functional env core is a pure JAX program, so ``jax.grad`` flows
through entire rollouts — a capability with no analog in the reference
(PyBullet's C++ stepper is a black box; cartpole.py:532-583 can only be
sampled). This demo swings the cartpole toward the upright goal by directly
descending the quadratic tracking cost w.r.t. an open-loop force sequence,
then reports the realized cost improvement.

Run: python differentiable_sim_demo.py [T] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

from safe_control_gym_tpu.utils.registration import make


def build(T=60):
    env = make('cartpole', seed=0, ctrl_freq=15, pyb_freq=750,
               init_state={'init_theta': 0.4}, randomized_init=False,
               cost='quadratic')
    func = env.func
    w = jnp.asarray([1.0, 0.1, 5.0, 0.1])

    def rollout_cost(actions, key):
        state, _ = func.reset(key)

        def body(state, a):
            state, out = func.step(state, a)
            x = state.state
            return state, jnp.sum(w * x * x) + 0.001 * jnp.sum(a * a)

        _, costs = jax.lax.scan(body, state, actions)
        return costs.sum()

    return env, jax.jit(jax.value_and_grad(rollout_cost))


def main(T=60, iters=500):
    env, cost_and_grad = build(T)
    key = jax.random.PRNGKey(0)
    actions = jnp.zeros((T, 1))
    opt = optax.adam(0.1)
    opt_state = opt.init(actions)
    c0, _ = cost_and_grad(actions, key)
    t0 = time.perf_counter()
    for i in range(iters):
        c, g = cost_and_grad(actions, key)
        updates, opt_state = opt.update(g, opt_state)
        actions = optax.apply_updates(actions, updates)
    c = float(cost_and_grad(actions, key)[0])
    dt = time.perf_counter() - t0
    print(f'open-loop cost: {float(c0):.2f} -> {c:.2f} '
          f'({iters} gradient-through-physics steps in {dt:.1f}s)')
    env.close()
    return float(c0), c


if __name__ == '__main__':
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(T, iters)
