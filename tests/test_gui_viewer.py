"""Live GUI viewer: gui=True opens a persistent window redrawn per step.

Role parity with the reference's PyBullet GUI client
(cartpole.py:173-180): interactive on a display, offscreen under Agg so
gui-mode configs run on headless TPU hosts. Pacing of GUI runs is
BaseExperiment.visualization_time_multiplier (tested in
tests/test_controllers.py).
"""

import numpy as np

from safe_control_gym_tpu.utils.registration import make


def test_gui_viewer_redraws_per_step():
    env = make('cartpole', gui=True, seed=1, randomized_init=False,
               init_state={'init_theta': 0.1}, ctrl_freq=15, pyb_freq=750,
               episode_len_sec=1)
    assert env.GUI is True and env._viewer is None  # lazy until first reset
    env.reset()
    assert env._viewer is not None
    assert env._viewer.frame_count == 1
    for _ in range(3):
        env.step(np.zeros(1, np.float32))
    assert env._viewer.frame_count == 4
    # render('human') routes to the same window.
    assert env.render('human') is None
    assert env._viewer.frame_count == 5
    # Headless CI runs under a non-interactive backend; the same draw
    # path must have produced real frames offscreen.
    env._viewer.fig.canvas.draw()
    frame = np.asarray(env._viewer.fig.canvas.buffer_rgba())
    assert frame.ndim == 3 and float(frame.std()) > 1.0
    env.close()
    assert env._viewer is None


def test_gui_viewer_quadrotor_human_mode():
    env = make('quadrotor', quad_type=3, gui=True, seed=3, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=1, randomized_init=False,
               init_state={'init_z': 1.0},
               task_info={'stabilization_goal': [0, 0, 1],
                          'stabilization_goal_tolerance': 0.0})
    env.reset()
    env.step(np.asarray(env.U_GOAL, np.float32))
    assert env._viewer.frame_count == 2
    # rgb_array still returns frames while the viewer is open.
    f = env.render('rgb_array')
    assert f.ndim == 3 and f.shape[2] == 3
    env.close()


def test_headless_envs_never_build_a_viewer():
    env = make('cartpole', seed=1, ctrl_freq=15, pyb_freq=750,
               episode_len_sec=1)
    env.reset()
    env.step(np.zeros(1, np.float32))
    assert env._viewer is None
    env.close()
