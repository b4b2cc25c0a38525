"""Video rendering: the true-3D quadrotor wireframe view feeding
save_video — role parity with the reference's PyBullet camera recording
(base_aviary.py:333-347 + utils.py save_video)."""

import os

import numpy as np
import pytest

from safe_control_gym_tpu.utils.registration import make
from safe_control_gym_tpu.utils.utils import save_video

pytestmark = pytest.mark.slow  # frame rendering + gif encoding


def test_quad3d_track_video(tmp_path):
    """Quad-3D figure8 tracking renders orientation-aware 3-D frames and
    save_video produces a real .gif."""
    env = make('quadrotor', quad_type=3, seed=42, ctrl_freq=50,
               pyb_freq=1000, task='traj_tracking',
               task_info={'trajectory_type': 'figure8',
                          'num_cycles': 1,
                          'trajectory_plane': 'xz',
                          'trajectory_position_offset': [0, 1],
                          'trajectory_scale': 1.0},
               episode_len_sec=2, randomized_init=False,
               init_state={'init_z': 1.0})
    obs, info = env.reset()
    # Slightly more than hover thrust: the drone climbs and tilts are
    # visible, so consecutive rendered frames must differ.
    act = 1.05 * np.asarray(env.U_GOAL, np.float32)
    frames = []
    done = False
    for i in range(20):
        obs, _, done, _ = env.step(act)
        if i % 4 == 0:
            frames.append(env.render('rgb_array'))
        if done:
            break
    assert all(f.ndim == 3 and f.shape[2] == 3 and f.dtype == np.uint8
               for f in frames)
    # Frames are not blank and actually change as the drone moves.
    assert float(np.std(frames[0])) > 1.0
    assert not np.array_equal(frames[0], frames[-1])
    path = str(tmp_path / 'quad3d_track.gif')
    save_video(path, frames, fps=10)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    env.close()


def test_cartpole_video(tmp_path):
    """Cartpole render('rgb_array') frames feed save_video (role of the
    reference's PyBullet camera capture, cartpole GUI path)."""
    env = make('cartpole', seed=42, randomized_init=False,
               init_state={'init_theta': 0.2}, ctrl_freq=15, pyb_freq=750,
               episode_len_sec=2)
    env.reset()
    frames = []
    for _ in range(4):
        env.step(np.zeros(1, np.float32))
        frames.append(env.render('rgb_array'))
    assert frames[0].ndim == 3 and frames[0].shape[2] == 3
    assert not np.array_equal(frames[0], frames[-1])
    path = str(tmp_path / 'cartpole.gif')
    save_video(path, frames, fps=10)
    assert os.path.exists(path) and os.path.getsize(path) > 500
    env.close()


def test_quad2d_planar_video(tmp_path):
    """The planar systems keep the rasterized view and feed save_video."""
    env = make('quadrotor', quad_type=2, seed=42, ctrl_freq=50,
               pyb_freq=1000, episode_len_sec=2, randomized_init=False,
               init_state={'init_z': 1.0},
               task_info={'stabilization_goal': [0, 1],
                          'stabilization_goal_tolerance': 0.0})
    env.reset()
    hover = np.asarray(env.U_GOAL, np.float32)
    frames = []
    for _ in range(4):
        env.step(hover)
        frames.append(env.render('rgb_array'))
    path = str(tmp_path / 'quad2d.gif')
    save_video(path, frames, fps=10)
    assert os.path.exists(path) and os.path.getsize(path) > 500
    env.close()
