"""safe-control-gym-tpu: a TPU-native benchmark suite for safe
learning-based control and safe RL.

Brand-new JAX/XLA implementation with the capabilities of
utiasDSL/safe-control-gym (IEEE RA-L 2022): CartPole and 1D/2D/3D quadrotor
environments with analytic priors, classic/MPC/RL controllers, MPSC and CBF
safety filters, constraint + disturbance systems, an experiment harness, and
vectorized (vmap/pjit-sharded) simulation.
"""

from safe_control_gym_tpu.version import __version__  # noqa: F401

# Importing subpackages triggers registry population
# (reference pattern: envs/controllers/safety_filters __init__ register ids).
import safe_control_gym_tpu.envs  # noqa: F401

try:  # controllers / safety filters may land later in the build
    import safe_control_gym_tpu.controllers  # noqa: F401
except ImportError:
    pass
try:
    import safe_control_gym_tpu.safety_filters  # noqa: F401
except ImportError:
    pass
