"""Safety filters: registration at import time
(reference safety_filters/__init__.py:5-15)."""

from safe_control_gym_tpu.utils.registration import register

register(idx='linear_mpsc',
         entry_point='safe_control_gym_tpu.safety_filters.mpsc.linear_mpsc:LINEAR_MPSC',
         config_entry_point='safe_control_gym_tpu.safety_filters.mpsc:linear_mpsc.yaml')

register(idx='cbf',
         entry_point='safe_control_gym_tpu.safety_filters.cbf.cbf:CBF',
         config_entry_point='safe_control_gym_tpu.safety_filters.cbf:cbf.yaml')

register(idx='cbf_nn',
         entry_point='safe_control_gym_tpu.safety_filters.cbf.cbf_nn:CBF_NN',
         config_entry_point='safe_control_gym_tpu.safety_filters.cbf:cbf_nn.yaml')
