"""Environments: registration at import time (reference envs/__init__.py:5-11)."""

from safe_control_gym_tpu.utils.registration import register

register(idx='cartpole',
         entry_point='safe_control_gym_tpu.envs.cartpole:CartPole',
         config_entry_point='safe_control_gym_tpu.envs:cartpole.yaml')

register(idx='quadrotor',
         entry_point='safe_control_gym_tpu.envs.quadrotor:Quadrotor',
         config_entry_point='safe_control_gym_tpu.envs:quadrotor.yaml')
