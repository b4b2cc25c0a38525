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

register(idx='mpc',
         entry_point='safe_control_gym_tpu.controllers.mpc.mpc:MPC',
         config_entry_point='safe_control_gym_tpu.controllers.mpc:mpc.yaml')

register(idx='linear_mpc',
         entry_point='safe_control_gym_tpu.controllers.mpc.linear_mpc:LinearMPC',
         config_entry_point='safe_control_gym_tpu.controllers.mpc:linear_mpc.yaml')

register(idx='gp_mpc',
         entry_point='safe_control_gym_tpu.controllers.mpc.gp_mpc:GPMPC',
         config_entry_point='safe_control_gym_tpu.controllers.mpc:gp_mpc.yaml')

register(idx='mpc_acados',
         entry_point='safe_control_gym_tpu.controllers.mpc.mpc_acados:MPC_ACADOS',
         config_entry_point='safe_control_gym_tpu.controllers.mpc:mpc_acados.yaml')

register(idx='ppo',
         entry_point='safe_control_gym_tpu.controllers.ppo.ppo:PPO',
         config_entry_point='safe_control_gym_tpu.controllers.ppo:ppo.yaml')

register(idx='sac',
         entry_point='safe_control_gym_tpu.controllers.sac.sac:SAC',
         config_entry_point='safe_control_gym_tpu.controllers.sac:sac.yaml')

register(idx='ddpg',
         entry_point='safe_control_gym_tpu.controllers.ddpg.ddpg:DDPG',
         config_entry_point='safe_control_gym_tpu.controllers.ddpg:ddpg.yaml')

register(idx='safe_explorer_ppo',
         entry_point='safe_control_gym_tpu.controllers.safe_explorer.safe_ppo:SafeExplorerPPO',
         config_entry_point='safe_control_gym_tpu.controllers.safe_explorer:safe_explorer_ppo.yaml')

register(idx='rarl',
         entry_point='safe_control_gym_tpu.controllers.rarl.rarl:RARL',
         config_entry_point='safe_control_gym_tpu.controllers.rarl:rarl.yaml')

register(idx='rap',
         entry_point='safe_control_gym_tpu.controllers.rarl.rap:RAP',
         config_entry_point='safe_control_gym_tpu.controllers.rarl:rap.yaml')
