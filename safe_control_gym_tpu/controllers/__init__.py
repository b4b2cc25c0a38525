"""Controllers: registration at import time
(reference controllers/__init__.py:5-55)."""

from safe_control_gym_tpu.utils.registration import register

register(idx='lqr',
         entry_point='safe_control_gym_tpu.controllers.lqr.lqr:LQR',
         config_entry_point='safe_control_gym_tpu.controllers.lqr:lqr.yaml')

register(idx='ilqr',
         entry_point='safe_control_gym_tpu.controllers.lqr.ilqr:iLQR',
         config_entry_point='safe_control_gym_tpu.controllers.lqr:ilqr.yaml')

register(idx='pid',
         entry_point='safe_control_gym_tpu.controllers.pid.pid:PID',
         config_entry_point='safe_control_gym_tpu.controllers.pid:pid.yaml')

register(idx='ppo',
         entry_point='safe_control_gym_tpu.controllers.ppo.ppo:PPO',
         config_entry_point='safe_control_gym_tpu.controllers.ppo:ppo.yaml')
