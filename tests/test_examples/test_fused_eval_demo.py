"""Fleet policy-eval demo: the committed pretrained PPO cartpole policy
stabilizes — near-max episode returns over a fleet in one program."""

import importlib.util
import os


def test_fused_eval_demo_pretrained_policy_stabilizes():
    path = os.path.join(os.path.dirname(__file__), '..', '..', 'examples',
                        'rl', 'fused_eval_demo.py')
    spec = importlib.util.spec_from_file_location('fused_eval_demo', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.run(batch=64, n_steps=400)
    assert res['episodes'] > 0
    # The committed artifact solves cartpole stabilization: the 250-step
    # (5 s x 50 Hz) episodes run near full length with near-1 rewards.
    assert res['ep_length_mean'] > 150, res
    assert res['ep_return_mean'] > 0.7 * res['ep_length_mean'], res
