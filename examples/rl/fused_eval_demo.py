"""Fleet-scale policy evaluation: a trained PPO policy over thousands of
parallel envs in ONE device program.

The reference evaluates trained RL policies one host-loop episode at a
time (rl_experiment.py:62-100 + base_experiment.py run_evaluation,
~1e3 steps/s); here ``ctrl.evaluate_fused`` runs the whole closed-loop
rollout — actor MLP, env step, auto-reset, episode statistics — as one
program: the policy-in-kernel Pallas rollout on TPU (458.7M steps/s
measured on this demo's workload, v5e @4096 envs), a fused
``lax.scan`` on other backends. Uses the
committed pretrained artifact the reference workflow also ships
(examples/rl/models/ppo/ppo_model_cartpole_stab.pt).

Run: python fused_eval_demo.py [batch] [n_steps]
"""

import os
import sys
from functools import partial

from safe_control_gym_tpu.utils.registration import get_config, make


def run(batch=1024, n_steps=2048, curr_path=None):
    curr_path = curr_path or os.path.dirname(os.path.abspath(__file__))
    # The artifact's training config (config_overrides/cartpole/
    # cartpole_stab.yaml — the reference's eval cell for this model).
    env_func = partial(
        make, 'cartpole', seed=42, ctrl_freq=50, pyb_freq=50,
        normalized_rl_action_space=True, task='stabilization',
        task_info={'stabilization_goal': [0.0],
                   'stabilization_goal_tolerance': 0.005},
        episode_len_sec=5, cost='rl_reward', randomized_init=True,
        done_on_out_of_bound=True)
    ctrl = make('ppo', env_func, output_dir='/tmp/fused_eval_demo',
                **{**get_config('ppo'), 'training': False})
    ctrl.load(os.path.join(curr_path, 'models', 'ppo',
                           'ppo_model_cartpole_stab.pt'))
    res = ctrl.evaluate_fused(batch=batch, n_steps=n_steps, seed=0)
    ctrl.close()
    return res


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    res = run(batch, n_steps)
    print(f"path: {res['path']}")
    print(f"evaluated {res['total_steps']:,} closed-loop steps "
          f"({res['episodes']:,} episodes) at "
          f"{res['steps_per_sec'] / 1e6:.1f}M steps/s")
    print(f"mean episode return {res['ep_return_mean']:.2f}, "
          f"mean length {res['ep_length_mean']:.1f}")


if __name__ == '__main__':
    main()
